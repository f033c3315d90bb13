"""Migrate a reference-format `memory.pt` (torch pickle,
`process_dstc2_with_SEP.py:427`) to this framework's `memory.json`.

Usage: python tools/convert_memory.py <memory.pt> [memory.json]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from nbest_asr_tpu.data.vocab import Memory  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(src), "memory.json")
    mem = Memory.from_torch_pt(src)
    mem.save(dst)
    arr = mem.arrays()
    print(f"wrote {dst}: {len(mem.word2idx)} words, {mem.n_bottom} labels,"
          f" {mem.n_top} top groups"
          f" ({int(arr.is_multi_top.sum())} multi-bottom)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
