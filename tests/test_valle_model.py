"""Model-level tests: forward losses for all stages/prefix modes, AR decode,
NAR passes, pad_y_eos and accuracy semantics.

Mirrors the coverage of reference valle/tests/valle_test.py (test_vallf /
test_valle / test_vallef_prefix4) but with jitted calls and value-level
checks where the reference only smoke-tests shapes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.models import (
    ValleConfig,
    init_valle,
    pad_y_eos,
    stage_params_mask,
    top10_accuracy,
    valle_forward,
    valle_inference,
)


def tiny_cfg(**kw):
    base = dict(model_name="valle", d_model=32, nhead=2, num_layers=2,
                num_quantizers=8, max_len=512, max_prefix_len=8)
    base.update(kw)
    return ValleConfig(**base)


def make_batch(rng, B=2, S=9, T=24, Q=8, prompt_P=6):
    ks = jax.random.split(rng, 3)
    batch = {
        "text": jax.random.randint(ks[0], (B, S), 0, 100),
        "text_lens": jnp.array([S, S - 3]),
        "audio": jax.random.randint(ks[1], (B, T, Q), 0, 1024),
        "audio_lens": jnp.array([T, T - 5]),
        "prompt_codes": jax.random.randint(ks[2], (B, prompt_P, Q), 0, 1024),
        "prompt_lens": jnp.array([prompt_P, prompt_P]),
    }
    return batch


@pytest.mark.parametrize("model_name", ["valle", "vallf"])
@pytest.mark.parametrize("prefix_mode", [0, 1, 2, 4])
def test_forward_all_stages(model_name, prefix_mode):
    cfg = tiny_cfg(model_name=model_name, prefix_mode=prefix_mode)
    params, state = init_valle(jax.random.PRNGKey(0), cfg)
    batch = make_batch(jax.random.PRNGKey(1))

    for stage in (0, 1, 2):
        fwd = jax.jit(functools.partial(
            valle_forward, cfg=cfg, train_stage=stage, deterministic=False))
        loss, metrics, _ = fwd(params, batch=batch,
                               rng=jax.random.PRNGKey(2), state=state)
        assert jnp.isfinite(loss)
        assert float(loss) > 0
        if stage in (0, 1):
            assert "ArTop10Accuracy" in metrics
        if stage in (0, 2):
            assert "NarTop10Accuracy" in metrics
            assert 0.0 <= float(metrics["NarTop10Accuracy"]) <= 1.0


def test_forward_prepend_bos_and_single_quantizer():
    for kw in (dict(prepend_bos=True), dict(num_quantizers=1),
               dict(prepend_bos=True, num_quantizers=1),
               dict(norm_first=False)):
        cfg = tiny_cfg(**kw)
        params, state = init_valle(jax.random.PRNGKey(0), cfg)
        batch = make_batch(jax.random.PRNGKey(1), Q=cfg.num_quantizers)
        fwd = jax.jit(functools.partial(
            valle_forward, cfg=cfg, train_stage=0, deterministic=False))
        loss, _, _ = fwd(params, batch=batch, rng=jax.random.PRNGKey(2),
                         state=state)
        assert jnp.isfinite(loss)


def test_pad_y_eos_semantics():
    """Targets = codes shifted with EOS at true length; pads become EOS
    (reference valle.py:322-333 — no ignore_index in the AR loss)."""
    codes0 = jnp.array([[5, 6, 7, 0, 0]])  # len 3, zero-padded
    mask_int = jnp.array([[0, 0, 0, 1, 1]])
    inputs, targets = pad_y_eos(codes0, mask_int, eos_id=1024,
                                prepend_bos=False, bos_id=1025)
    np.testing.assert_array_equal(np.asarray(inputs),
                                  [[5, 6, 7, 1024, 1024]])
    np.testing.assert_array_equal(np.asarray(targets),
                                  [[6, 7, 1024, 1024, 1024]])

    inputs_b, targets_b = pad_y_eos(codes0, mask_int, eos_id=1024,
                                    prepend_bos=True, bos_id=1025)
    np.testing.assert_array_equal(np.asarray(inputs_b),
                                  [[1025, 5, 6, 7, 1024, 1024]])
    np.testing.assert_array_equal(np.asarray(targets_b),
                                  [[5, 6, 7, 1024, 1024, 1024]])


def test_top10_accuracy_matches_manual():
    """Pins the metric semantics the reference gets from torchmetrics
    (reference valle/tests/valle_test.py:185-222)."""
    V = 20
    logits = jnp.zeros((1, 4, V))
    # put targets of positions 0,1 inside top-10, positions 2 outside
    logits = logits.at[0, 0, 3].set(5.0)   # target 3 -> rank 1: hit
    logits = logits.at[0, 1, :].set(jnp.arange(V, dtype=jnp.float32))
    targets = jnp.array([[3, 12, 0, 19]])
    # position 1: target 12, top10 of arange = ids 10..19 -> hit
    # position 2: target 0, logits flat zero.. top_k picks first 10 -> we
    #   made position 2's logits distinct to force a miss:
    logits = logits.at[0, 2, 10:].set(1.0)  # top10 = ids 10..19, target 0 miss
    # position 3: ignore_id
    acc = top10_accuracy(logits, targets, ignore_id=19)
    assert acc == pytest.approx(2.0 / 3.0)


def test_stage_params_mask():
    cfg = tiny_cfg()
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    m1 = stage_params_mask(params, 1)
    assert all(jax.tree_util.tree_leaves(m1["ar"]))
    assert not any(jax.tree_util.tree_leaves(m1["nar"]))
    m2 = stage_params_mask(params, 2)
    assert not any(jax.tree_util.tree_leaves(m2["ar"]))
    assert all(jax.tree_util.tree_leaves(m2["nar"]))


@pytest.mark.parametrize("prefix_mode", [0, 1])
def test_inference_shapes_and_ranges(prefix_mode):
    cfg = tiny_cfg(prefix_mode=prefix_mode)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    B, S, P, G = 2, 9, 6, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    text = jax.random.randint(ks[0], (B, S), 0, 100)
    text_lens = jnp.array([S, S - 2])
    prompt_codes = jax.random.randint(ks[1], (B, P, 8), 0, 1024)
    prompt_lens = jnp.array([P, P - 2])

    codes, gen_lens = valle_inference(
        params, cfg, text, text_lens, prompt_codes, prompt_lens,
        top_k=10, temperature=1.0, rng=ks[2], max_gen_len=G)
    assert codes.shape == (B, G, 8)
    assert codes.dtype == jnp.int32
    assert bool(jnp.all(gen_lens <= G))
    assert bool(jnp.all(codes >= 0)) and bool(jnp.all(codes < 1024))


def test_inference_respects_gen_lens():
    """Tokens past gen_lens must be zeros (inactive lanes masked)."""
    cfg = tiny_cfg()
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    B, S, P, G = 1, 6, 4, 12
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    text = jax.random.randint(ks[0], (B, S), 0, 100)
    codes, gen_lens = valle_inference(
        params, cfg, text, jnp.array([S]),
        jax.random.randint(ks[1], (B, P, 8), 0, 1024), jnp.array([P]),
        top_k=2, rng=ks[2], max_gen_len=G)
    gl = int(gen_lens[0])
    if gl < G:
        assert bool(jnp.all(codes[0, gl:, 0] == 0))


def test_resolve_remat_policy():
    """--remat auto maps to the measured per-stage optimum
    (bench_train_stage.py / BASELINE.md round-3 rows)."""
    from valle_tpu.models import get_model, resolve_remat

    assert resolve_remat("auto", 1) == "full"
    assert resolve_remat("auto", 0) == "full"
    assert resolve_remat("auto", 2) == "none"
    assert resolve_remat("dots", 2) == "dots"
    assert resolve_remat("scores", 1) == "scores"
    with pytest.raises(ValueError):
        resolve_remat("bogus", 1)

    class P:
        model_name = "valle"
        decoder_dim = 32
        nhead = 2
        num_decoder_layers = 2
        norm_first = True
        add_prenet = False
        prefix_mode = 1
        share_embedding = True
        scale_factor = 1.0
        prepend_bos = False
        num_quantizers = 8
        remat = "auto"
        train_stage = 2

    assert get_model(P()).cfg.remat == "none"
    P.train_stage = 1
    assert get_model(P()).cfg.remat == "full"


@pytest.mark.parametrize("remat", ["none", "dots", "scores"])
def test_remat_policy_value_parity(remat):
    """Remat is a schedule choice, not a math change: training losses and
    gradients under "none"/"dots"/"scores" match "full" to fp32 round-off
    ("scores" drops only the named S x S attention score/prob residuals
    and recomputes them in the backward pass)."""
    cfg_full = tiny_cfg(remat="full")
    cfg_alt = tiny_cfg(remat=remat)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg_full)
    batch = make_batch(jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(2)

    def loss_fn(p, cfg):
        # deterministic=False so remat is live (training = not
        # deterministic); the shared rng keeps dropout masks identical.
        loss, _, _ = valle_forward(p, cfg, batch, train_stage=1, rng=rng,
                                   deterministic=False)
        return loss

    l_full, g_full = jax.value_and_grad(lambda p: loss_fn(p, cfg_full))(params)
    l_alt, g_alt = jax.value_and_grad(lambda p: loss_fn(p, cfg_alt))(params)
    np.testing.assert_allclose(np.asarray(l_full), np.asarray(l_alt),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_alt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_attn_score_bf16_policy_and_loss_parity():
    """--attn-score-bf16 auto enables bf16 scores for every bf16 stage; at
    fp32 compute the flag
    is inert (bitwise-equal losses); at bf16 compute the loss stays within
    the loss-parity band measured on the chip (BASELINE.md round-3)."""
    from valle_tpu.models import resolve_score_bf16

    assert resolve_score_bf16("auto") is True   # all bf16 stages: AR +36%
    assert resolve_score_bf16("off") is False
    with pytest.raises(ValueError):
        resolve_score_bf16("maybe")

    params, _ = init_valle(jax.random.PRNGKey(0), tiny_cfg())
    batch = make_batch(jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(2)

    def loss(cfg, dt):
        l, _, _ = valle_forward(params, cfg, batch, train_stage=2, rng=rng,
                                deterministic=False, compute_dtype=dt)
        return float(l)

    l_f32_off = loss(tiny_cfg(attn_score_bf16=False), jnp.float32)
    l_f32_on = loss(tiny_cfg(attn_score_bf16=True), jnp.float32)
    assert l_f32_off == l_f32_on          # inert at fp32

    l_bf_off = loss(tiny_cfg(attn_score_bf16=False), jnp.bfloat16)
    l_bf_on = loss(tiny_cfg(attn_score_bf16=True), jnp.bfloat16)
    np.testing.assert_allclose(l_bf_on, l_bf_off, rtol=2e-2)
