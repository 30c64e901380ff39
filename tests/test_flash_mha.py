"""Fused fwd+bwd training attention (ops/flash_mha.py) parity tests.

The kernel pair replaces the einsum training attention at the layer level
(reference hot path: torch fused MHA + dropout-on-probs,
``valle/modules/activation.py:383-427``). CPU runs use interpret mode with
externally drawn dropout bytes (the interpreter has no TPU PRNG); the
byte-threshold estimator is identical to the production in-kernel draw.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.ops import masks as M
from valle_tpu.ops.attention import naive_attention
from valle_tpu.ops.flash_mha import flash_mha_train, reference_mha


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def _mk_qkv(key, B, H, S, D, T=None):
    T = T or S
    ks = jax.random.split(key, 3)
    return (_rand(ks[0], B, H, S, D), _rand(ks[1], B, H, T, D),
            _rand(ks[2], B, H, T, D))


class TestForwardParity:
    def test_ar_composite_mask(self):
        B, H, S, D = 2, 4, 200, 64
        q, k, v = _mk_qkv(jax.random.PRNGKey(0), B, H, S, D)
        x_lens = jnp.array([40, 64])
        y_lens = jnp.array([100, 130])
        qc, kc = M.flash_codes_ar_xy(x_lens, y_lens, 64, S - 64)
        out = flash_mha_train(q, k, v, qc, kc, interpret=True)
        ref = naive_attention(q, k, v,
                              M.ar_xy_attn_bias(x_lens, y_lens, 64, S - 64))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_nar_padding_mask(self):
        B, H, S, D = 2, 2, 160, 64
        q, k, v = _mk_qkv(jax.random.PRNGKey(1), B, H, S, D)
        x_lens = jnp.array([40, 64])
        y_lens = jnp.array([80, 96])
        qc, kc = M.flash_codes_padding(x_lens, y_lens, 64, S - 64)
        out = flash_mha_train(q, k, v, qc, kc, interpret=True)
        ref = naive_attention(q, k, v,
                              M.padding_attn_bias(x_lens, y_lens, 64, S - 64))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    @pytest.mark.parametrize("kind", ["ar", "nar"])
    def test_packed_masks(self, kind):
        B, H, D = 2, 2, 64
        text_seg = jnp.array([[0, 0, 0, 1, 1, -1, -1, -1] * 8] * B)
        audio_seg = jnp.array([[0, 0, 0, 0, 1, 1, -1, -1] * 12] * B)
        St = text_seg.shape[1] + audio_seg.shape[1]
        q, k, v = _mk_qkv(jax.random.PRNGKey(2), B, H, St, D)
        if kind == "ar":
            qc, kc, qs, ks = M.flash_codes_packed_ar(text_seg, audio_seg)
            bias = M.packed_ar_attn_bias(text_seg, audio_seg)
        else:
            qc, kc, qs, ks = M.flash_codes_packed_nar(text_seg, audio_seg)
            bias = M.packed_nar_attn_bias(text_seg, audio_seg)
        out = flash_mha_train(q, k, v, qc, kc, qseg=qs, kseg=ks,
                              add_diag=True, interpret=True)
        ref = naive_attention(q, k, v, bias)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_rectangular_and_unaligned(self):
        # S != T, both off the 128 grid (wrapper pads and slices)
        B, H, S, T, D = 1, 2, 90, 210, 64
        q, k, v = _mk_qkv(jax.random.PRNGKey(3), B, H, S, D, T=T)
        key_valid = jnp.arange(T)[None, :] < jnp.array([170])[:, None]
        qc, kc = M.flash_codes_key_valid(
            jnp.broadcast_to(key_valid, (B, T)))
        qc = qc[:, :S]
        out = flash_mha_train(q, k, v, qc, kc, interpret=True)
        bias = jnp.where(key_valid, 0.0, M.NEG_INF)[:, None, None, :]
        ref = naive_attention(q, k, v, bias)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_bf16_inputs(self):
        B, H, S, D = 2, 2, 128, 64
        q, k, v = _mk_qkv(jax.random.PRNGKey(4), B, H, S, D)
        qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
        x_lens = jnp.array([64, 64])
        y_lens = jnp.array([64, 64])
        qc, kc = M.flash_codes_ar_xy(x_lens, y_lens, 64, 64)
        out = flash_mha_train(qb, kb, vb, qc, kc, interpret=True)
        ref = naive_attention(qb, kb, vb,
                              M.ar_xy_attn_bias(x_lens, y_lens, 64, 64))
        np.testing.assert_allclose(out.astype(jnp.float32),
                                   ref.astype(jnp.float32), atol=0.05)


class TestGradParity:
    def test_grads_match_xla_ad(self):
        B, H, S, D = 2, 2, 160, 64
        q, k, v = _mk_qkv(jax.random.PRNGKey(5), B, H, S, D)
        x_lens = jnp.array([40, 64])
        y_lens = jnp.array([80, 96])
        qc, kc = M.flash_codes_ar_xy(x_lens, y_lens, 64, S - 64)
        bias = M.ar_xy_attn_bias(x_lens, y_lens, 64, S - 64)
        w = _rand(jax.random.PRNGKey(6), B, H, S, D)  # fixed cotangent mix

        def f_flash(q, k, v):
            return jnp.sum(flash_mha_train(q, k, v, qc, kc,
                                           interpret=True) * w)

        def f_ref(q, k, v):
            return jnp.sum(naive_attention(q, k, v, bias) * w)

        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(a, b, atol=5e-5)

    def test_dropout_fwd_and_grads_match_reference(self):
        """With explicit bits the kernel's dropout math must match the
        einsum oracle exactly (fwd AND all three grads)."""
        B, H, S, D = 2, 2, 160, 64
        rate = 0.1
        q, k, v = _mk_qkv(jax.random.PRNGKey(7), B, H, S, D)
        x_lens = jnp.array([40, 64])
        y_lens = jnp.array([80, 96])
        qc, kc = M.flash_codes_ar_xy(x_lens, y_lens, 64, S - 64)
        bits = jax.random.bits(jax.random.PRNGKey(8), (B, H, S, S),
                               jnp.uint8)
        out = flash_mha_train(q, k, v, qc, kc, dropout_rate=rate,
                              debug_bits=bits, interpret=True)
        ref = reference_mha(q, k, v, qc, kc, dropout_rate=rate,
                            debug_bits=bits)
        np.testing.assert_allclose(out, ref, atol=2e-5)

        g1 = jax.grad(lambda *a: jnp.sum(flash_mha_train(
            *a, qc, kc, dropout_rate=rate, debug_bits=bits,
            interpret=True) ** 2), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda *a: jnp.sum(reference_mha(
            *a, qc, kc, dropout_rate=rate, debug_bits=bits) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_dropout_estimator_unbiased(self):
        """E[dropout(p)] == p under the quantized byte-threshold rule."""
        rate = 0.1
        thresh = int(round(rate * 256))
        keep_p = 1.0 - thresh / 256.0
        bits = jax.random.bits(jax.random.PRNGKey(9), (200000,), jnp.uint8)
        keep = (bits.astype(jnp.int32) >= thresh).astype(jnp.float32)
        est = jnp.mean(keep / keep_p)
        assert abs(float(est) - 1.0) < 5e-3


class TestModelLevel:
    def _batch(self, key, B=2, S=12, T=30):
        return {
            "text": jax.random.randint(key, (B, S), 0, 100),
            "text_lens": jnp.array([8, 12]),
            "audio": jax.random.randint(key, (B, T, 8), 0, 1024),
            "audio_lens": jnp.array([20, 30]),
        }

    @pytest.mark.parametrize("stage", [1, 2])
    def test_forward_loss_parity(self, stage):
        from dataclasses import replace

        from valle_tpu.models import ValleConfig, init_valle, valle_forward

        cfg = ValleConfig(d_model=64, nhead=4, num_layers=2,
                          num_quantizers=8, prefix_mode=1)
        params, state = init_valle(jax.random.PRNGKey(0), cfg)
        batch = self._batch(jax.random.PRNGKey(5))
        losses = {}
        for impl in ("einsum", "flash"):
            c = replace(cfg, attn_impl=impl)
            loss, _, _ = valle_forward(
                params, c, batch, train_stage=stage, rng=None,
                deterministic=True, state=state, nar_stage=3,
                nar_prefix_len=4)
            losses[impl] = float(loss)
        assert losses["einsum"] == pytest.approx(losses["flash"], rel=1e-5)

    def test_training_grads_close(self):
        """Training step (dropout ON): on CPU the flash fallback draws the
        same uint8 bytes as modules.embedding.dropout from the same rng,
        so the losses/grads must agree to numerics."""
        from dataclasses import replace

        from valle_tpu.models import ValleConfig, init_valle, valle_forward

        cfg = ValleConfig(d_model=64, nhead=4, num_layers=2,
                          num_quantizers=8, prefix_mode=1)
        params, state = init_valle(jax.random.PRNGKey(0), cfg)
        batch = self._batch(jax.random.PRNGKey(5))

        def loss_fn(p, impl):
            c = replace(cfg, attn_impl=impl)
            loss, _, _ = valle_forward(
                p, c, batch, train_stage=1, rng=jax.random.PRNGKey(7),
                deterministic=False, state=state)
            return loss

        l1, g1 = jax.value_and_grad(loss_fn)(params, "flash")
        l2, g2 = jax.value_and_grad(loss_fn)(params, "einsum")
        assert float(l1) == pytest.approx(float(l2), rel=1e-5)
        n1 = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                          for g in jax.tree_util.tree_leaves(g1)))
        n2 = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                          for g in jax.tree_util.tree_leaves(g2)))
        assert float(n1) == pytest.approx(float(n2), rel=1e-4)

    def test_packed_forwards_parity(self):
        from dataclasses import replace

        from valle_tpu.models import ValleConfig, init_valle
        from valle_tpu.models.valle import (
            valle_ar_forward_packed,
            valle_nar_forward_packed,
        )

        cfg = ValleConfig(d_model=64, nhead=4, num_layers=2,
                          num_quantizers=8, prefix_mode=1)
        params, state = init_valle(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(5)
        B = 2
        text_seg = jnp.array([[0] * 6 + [1] * 4 + [-1] * 2] * B)
        text_pos = jnp.array(
            [list(range(6)) + list(range(4)) + [0, 0]] * B)
        audio_seg = jnp.array([[0] * 14 + [1] * 12 + [-1] * 4] * B)
        audio_pos = jnp.array(
            [list(range(14)) + list(range(12)) + [0] * 4] * B)
        pbatch = {
            "text": jax.random.randint(key, (B, 12), 0, 100),
            "text_seg": text_seg, "text_pos": text_pos,
            "ar_inputs": jax.random.randint(key, (B, 30), 0, 1024),
            "ar_targets": jnp.where(
                audio_seg >= 0,
                jax.random.randint(key, (B, 30), 0, 1024), -1),
            "audio_seg": audio_seg, "audio_pos": audio_pos,
            "row_frames": jnp.array([26, 26]),
        }
        losses = {}
        for impl in ("einsum", "flash"):
            c = replace(cfg, attn_impl=impl)
            loss, _, _ = valle_ar_forward_packed(
                params, c, pbatch, rng=None, deterministic=True,
                state=state)
            losses[impl] = float(loss)
        assert losses["einsum"] == pytest.approx(losses["flash"], rel=1e-5)

        nbatch = {
            "text": pbatch["text"], "text_seg": text_seg,
            "text_pos": text_pos,
            "nar_codes": jax.random.randint(key, (B, 30, 8), 0, 1024)
            * (audio_seg >= 0)[..., None],
            "audio_seg": audio_seg, "audio_pos": audio_pos,
            "seg_frames": jnp.array([[14, 12], [14, 12]]),
            "row_frames": jnp.array([26, 26]),
        }
        losses = {}
        for impl in ("einsum", "flash"):
            c = replace(cfg, attn_impl=impl)
            loss, _, _ = valle_nar_forward_packed(
                params, c, nbatch, rng=None, deterministic=True,
                state=state, nar_stage=3, nar_prefix_len=2)
            losses[impl] = float(loss)
        assert losses["einsum"] == pytest.approx(losses["flash"], rel=1e-5)


class TestNarInference:
    def test_nar_decode_token_parity(self):
        """valle_nar_decode(attn_impl='flash') must produce the exact
        argmax token sequences of the einsum path at fp32 (deterministic
        softmax math both ways; the mask is rebuilt from codes)."""
        from valle_tpu.models import ValleConfig, init_valle
        from valle_tpu.models.inference import valle_nar_decode

        cfg = ValleConfig(d_model=64, nhead=4, num_layers=2,
                          num_quantizers=8, prefix_mode=1)
        params, _ = init_valle(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(3)
        B, S, P, G = 2, 12, 20, 24
        text = jax.random.randint(key, (B, S), 0, 100)
        text_lens = jnp.array([8, 12])
        prompts = jax.random.randint(key, (B, P, 8), 0, 1024)
        p_lens = jnp.array([16, 20])
        gen_q0 = jax.random.randint(key, (B, G), 0, 1024)
        g_lens = jnp.array([20, 24])
        outs = {}
        for impl in ("einsum", "flash"):
            outs[impl] = np.asarray(valle_nar_decode(
                params, cfg, text, text_lens, prompts, p_lens,
                gen_q0, g_lens, attn_impl=impl))
        np.testing.assert_array_equal(outs["einsum"], outs["flash"])


def test_resolver():
    from valle_tpu.models import resolve_attn_impl

    # auto = flash on TPU, einsum elsewhere (tests run on CPU)
    expect = "flash" if jax.default_backend() == "tpu" else "einsum"
    assert resolve_attn_impl("auto") == expect
    assert resolve_attn_impl("auto", "vallf") == "einsum"
    assert resolve_attn_impl("flash") == "flash"
    assert resolve_attn_impl("einsum") == "einsum"
    assert resolve_attn_impl("flash", "vallf") == "einsum"
    with pytest.raises(ValueError):
        resolve_attn_impl("bogus")
