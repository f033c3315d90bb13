from .vocab import Memory, HierarchyArrays
from .dataset import read_sep_data, stratified_coverage_sample
from .tokenizer import WordVocabTokenizer, load_tokenizer
from .input_builder import build_inputs, pack_split, PackedSplit

__all__ = [
    "Memory",
    "HierarchyArrays",
    "read_sep_data",
    "stratified_coverage_sample",
    "WordVocabTokenizer",
    "load_tokenizer",
    "build_inputs",
    "pack_split",
    "PackedSplit",
]
