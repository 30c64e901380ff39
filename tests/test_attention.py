"""Flash-attention kernel vs the einsum oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.ops.attention import (
    flash_attention,
    fused_attention,
    naive_attention,
)


def make_inputs(B=2, H=4, S=256, T=256, D=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    lens = jnp.array([T, int(T * 0.7)][:B])
    key_valid = jnp.where(jnp.arange(T)[None, :] < lens[:, None], 0.0,
                          -jnp.inf)
    bias = key_valid[:, None, None, :]
    if S == T:  # add a causal structure when square
        pos = jnp.arange(S)
        causal = jnp.where(pos[None, :] <= pos[:, None], 0.0, -jnp.inf)
        bias = bias + causal[None, None]
    return q, k, v, jnp.broadcast_to(bias, (B, 1, S, T))


def test_flash_matches_naive_forward_and_grads():
    q, k, v, bias = make_inputs()
    ref = naive_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias, 128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    gf = jax.grad(lambda *a: jnp.sum(
        flash_attention(*a, bias, 128, 128, True) ** 2), argnums=(0, 1, 2))(
        q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(
        naive_attention(*a, bias) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_attention_pads_odd_shapes():
    """Non-tile-multiple S/T must pad+mask correctly (interpret mode)."""
    q, k, v, bias = make_inputs(S=200, T=333)
    ref = naive_attention(q, k, v, bias)
    out = fused_attention(q, k, v, bias, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_fully_masked_row():
    """Rows whose keys are ALL masked must produce finite output."""
    q, k, v, _ = make_inputs(S=128, T=128)
    bias = jnp.full((2, 1, 128, 128), -jnp.inf)
    bias = bias.at[:, :, :, :4].set(0.0)
    bias = bias.at[0, :, 5].set(-jnp.inf)  # row 5 of sample 0 fully masked
    out = fused_attention(q, k, v, bias, use_pallas=True, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_cpu_dispatch_falls_back():
    q, k, v, bias = make_inputs(S=64, T=64)
    out = fused_attention(q, k, v, bias)  # cpu backend -> naive
    ref = naive_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_decode_kernel_matches_oracle():
    """Pallas decode kernel (interpret) vs the bias-mask oracle."""
    import jax
    import jax.numpy as jnp

    from valle_tpu.ops.decode_attention import decode_attention

    B, H, T, D, S = 3, 4, 512, 64, 40
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, 1, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    x_lens = jnp.array([40, 25, 10])
    wp = jnp.array([300, 120, 60])
    # the kernel takes TRANSPOSED caches (B, H, D, T)
    out = decode_attention(q, jnp.swapaxes(k, -2, -1),
                           jnp.swapaxes(v, -2, -1), x_lens, wp, S=S,
                           block_k=128, interpret=True)
    kk = jnp.arange(T)[None, :]
    valid = (kk < x_lens[:, None]) | ((kk >= S) & (kk <= wp[:, None]))
    bias = jnp.where(valid, 0.0, -jnp.inf)[:, None, None, :]
    ref = naive_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_ar_decode_kernel_token_equality():
    """use_decode_kernel must not change a single generated token."""
    import jax
    import jax.numpy as jnp

    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    cfg = ValleConfig(d_model=32, nhead=2, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512, max_prefix_len=8)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    B, S, P, G = 2, 9, 6, 20
    text = jax.random.randint(ks[0], (B, S), 0, 90)
    text_lens = jnp.array([9, 6])
    pq0 = jax.random.randint(ks[1], (B, P), 0, 1024)
    p_lens = jnp.array([6, 4])
    base, bl = valle_ar_decode(params, cfg, text, text_lens, pq0, p_lens,
                               ks[2], top_k=1, max_gen_len=G)
    kern, kl = valle_ar_decode(params, cfg, text, text_lens, pq0, p_lens,
                               ks[2], top_k=1, max_gen_len=G,
                               use_decode_kernel=True, kernel_interpret=True)
    np.testing.assert_array_equal(np.asarray(bl), np.asarray(kl))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(kern))


def test_int8_grouped_kernel_matches_dequant_oracle():
    """Fused-dequant grouped kernel (interpret) == attention over the
    dequantized cache."""
    from valle_tpu.modules.transformer import quantize_kv
    from valle_tpu.ops.decode_attention_int8_grouped import (
        combine_kv_int8,
        decode_attention_int8_grouped,
        stack_scales,
    )

    B, H, T, D, S = 8, 4, 512, 64, 40
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, 1, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    kq, ksc = quantize_kv(k)
    vq, vsc = quantize_kv(v)
    x_lens = jnp.array([40, 25, 10, 33, 7, 40, 18, 2])
    wp = jnp.array([300, 120, 60, 440, 95, 511, 200, 47])

    out = decode_attention_int8_grouped(
        q, combine_kv_int8(kq, vq), stack_scales(ksc, vsc), x_lens, wp,
        S=S, group=8, interpret=True)

    kk = jnp.arange(T)[None, :]
    valid = (kk < x_lens[:, None]) | ((kk >= S) & (kk <= wp[:, None]))
    bias = jnp.where(valid, 0.0, -jnp.inf)[:, None, None, :]
    ref = naive_attention(q, kq.astype(jnp.float32) * ksc[..., None],
                          vq.astype(jnp.float32) * vsc[..., None], bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ar_decode_int8_grouped_token_agreement():
    """int8_grouped kernel decode: matching lengths and >90% token
    agreement with the exact path (int8 K/V quantization can flip
    near-ties on an untrained model)."""
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    cfg = ValleConfig(d_model=32, nhead=2, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512, max_prefix_len=8)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    B, S, P, G = 8, 9, 6, 16
    text = jax.random.randint(ks[0], (B, S), 0, 90)
    text_lens = jnp.full((B,), S).at[1].set(6)
    pq0 = jax.random.randint(ks[1], (B, P), 0, 1024)
    p_lens = jnp.full((B,), P).at[1].set(4)
    base, bl = valle_ar_decode(params, cfg, text, text_lens, pq0, p_lens,
                               ks[2], top_k=1, max_gen_len=G,
                               force_full_length=True)
    i8, il = valle_ar_decode(params, cfg, text, text_lens, pq0, p_lens,
                             ks[2], top_k=1, max_gen_len=G,
                             force_full_length=True,
                             use_decode_kernel=True, kernel_interpret=True,
                             decode_kernel_mode="int8_grouped")
    np.testing.assert_array_equal(np.asarray(bl), np.asarray(il))
    agreement = float((np.asarray(base) == np.asarray(i8)).mean())
    assert agreement > 0.9, agreement


def test_kv_grouped_kernel_matches_oracle():
    """Token-exact combined-KV grouped kernel (interpret) == masked
    attention over the same cache (no quantization)."""
    from valle_tpu.ops.decode_attention_kv import (
        combine_kv,
        decode_attention_kv,
    )

    B, H, T, D, S = 8, 4, 512, 64, 40
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, 1, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    x_lens = jnp.array([40, 25, 10, 33, 7, 40, 18, 2])
    wp = jnp.array([300, 120, 60, 440, 95, 511, 200, 47])

    out = decode_attention_kv(q, combine_kv(k, v), x_lens, wp,
                              S=S, group=8, interpret=True)

    kk = jnp.arange(T)[None, :]
    valid = (kk < x_lens[:, None]) | ((kk >= S) & (kk <= wp[:, None]))
    bias = jnp.where(valid, 0.0, -jnp.inf)[:, None, None, :]
    ref = naive_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_kv_block_k_invariants():
    """The kv kernel's block size must divide T (the block loop reads
    [blk*bk, blk*bk+bk) up to the max write position — a non-dividing bk
    reads past the cache end), be a 128-multiple, and respect the VMEM
    budget whenever the 128 floor allows it."""
    from valle_tpu.ops.decode_attention_kv import _VMEM_BUDGET, _block_k

    for H, G, T, D2, item in [
        (4, 8, 512, 128, 4),    # the oracle-test shape
        (16, 8, 512, 128, 2),   # flagship bf16
        (16, 8, 384, 128, 4),   # flagship fp32: budget < 128 -> floor
        (8, 8, 384, 256, 2),    # Dh=128 lanes; T=384 forces bk | T
        (4, 8, 128, 128, 2),    # single-block cache
    ]:
        bk = _block_k(H, G, T, D2, item)
        assert bk % 128 == 0 and T % bk == 0, (H, G, T, D2, item, bk)
        slot_bytes = H * G * bk * D2 * item
        assert slot_bytes <= _VMEM_BUDGET or bk == 128, (bk, slot_bytes)

    # the int8 kernel's block must also divide T (a cache rounded to 128
    # but not 256 — e.g. the serving shape 769 -> 896 — previously made
    # the last block read past the cache end), and inference.py's cache
    # rounding keeps the budget-optimal block at flagship shape
    from valle_tpu.ops.decode_attention_int8_grouped import (
        _block_k as i8_block,
        preferred_block,
    )

    assert i8_block(16, 8, 1024) == 256        # flagship long cache
    assert i8_block(16, 8, 896) == 128         # non-256-multiple: shrink
    assert preferred_block(16) == 256          # ...so allocators round to 256
    for H, T in [(16, 896), (16, 1024), (4, 512), (8, 384)]:
        bk = i8_block(H, 8, T)
        assert bk % 128 == 0 and T % bk == 0, (H, T, bk)


def test_lanes_kernel_matches_oracle():
    """Lane-combined contiguous-DMA kernel (interpret) == masked attention
    over the same K/V (token-exact layout #4; see
    ops/decode_attention_lanes.py)."""
    from valle_tpu.ops.decode_attention_lanes import (
        combine_kv_lanes,
        decode_attention_lanes,
    )

    B, H, T, D, S = 8, 4, 512, 64, 40
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, 1, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    x_lens = jnp.array([40, 25, 10, 33, 7, 40, 18, 2])
    wp = jnp.array([300, 120, 60, 440, 95, 511, 200, 47])

    out = decode_attention_lanes(q, combine_kv_lanes(k, v), x_lens, wp,
                                 S=S, nhead=H, group=8, interpret=True)

    kk = jnp.arange(T)[None, :]
    valid = (kk < x_lens[:, None]) | ((kk >= S) & (kk <= wp[:, None]))
    bias = jnp.where(valid, 0.0, -jnp.inf)[:, None, None, :]
    ref = naive_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("mode", ["bf16_grouped", "fused_kv", "mega",
                                  "lanes_grouped", "fused_lanes"])
def test_ar_decode_kv_grouped_token_equality(mode):
    """The combined-KV kernel modes are TOKEN-EXACT at fp32 — unlike
    int8_grouped, no quantization touches the cache, so every generated
    token must match the exact path bit-for-bit. "mega" additionally
    runs attention + the dense tail in one pallas_call
    (ops/fused_attn_tail.py)."""
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    d = (32 if mode in ("bf16_grouped", "lanes_grouped")
         else 128)  # fused kernels need 128-aligned dims
    cfg = ValleConfig(d_model=d, nhead=2, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512, max_prefix_len=8)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    B, S, P, G = 8, 9, 6, 16
    text = jax.random.randint(ks[0], (B, S), 0, 90)
    text_lens = jnp.full((B,), S).at[1].set(6)
    pq0 = jax.random.randint(ks[1], (B, P), 0, 1024)
    p_lens = jnp.full((B,), P).at[1].set(4)
    base, bl = valle_ar_decode(params, cfg, text, text_lens, pq0, p_lens,
                               ks[2], top_k=1, max_gen_len=G)
    kv, kl = valle_ar_decode(params, cfg, text, text_lens, pq0, p_lens,
                             ks[2], top_k=1, max_gen_len=G,
                             use_decode_kernel=True, kernel_interpret=True,
                             decode_kernel_mode=mode,
                             unroll_layers=mode not in ("bf16_grouped",
                                                        "lanes_grouped"))
    np.testing.assert_array_equal(np.asarray(bl), np.asarray(kl))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(kv))


def test_ar_decode_unroll_token_equality():
    """unroll_layers changes scheduling only — token-exact vs fori_loop."""
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    cfg = ValleConfig(d_model=32, nhead=2, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512, max_prefix_len=8)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    B, S, P, G = 2, 9, 6, 20
    text = jax.random.randint(ks[0], (B, S), 0, 90)
    text_lens = jnp.array([9, 6])
    pq0 = jax.random.randint(ks[1], (B, P), 0, 1024)
    p_lens = jnp.array([6, 4])
    base, bl = valle_ar_decode(params, cfg, text, text_lens, pq0, p_lens,
                               ks[2], top_k=1, max_gen_len=G)
    unr, ul = valle_ar_decode(params, cfg, text, text_lens, pq0, p_lens,
                              ks[2], top_k=1, max_gen_len=G,
                              unroll_layers=True)
    np.testing.assert_array_equal(np.asarray(bl), np.asarray(ul))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(unr))


def test_ar_decode_int8_cache_close():
    """int8 KV cache: tokens agree with the fp path on an untrained model
    (near-ties may flip; require >90% agreement and matching lengths)."""
    import jax
    import jax.numpy as jnp

    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    cfg = ValleConfig(d_model=64, nhead=4, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512, max_prefix_len=8)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    B, S, P, G = 2, 9, 6, 24
    text = jax.random.randint(ks[0], (B, S), 0, 90)
    text_lens = jnp.array([9, 6])
    pq0 = jax.random.randint(ks[1], (B, P), 0, 1024)
    p_lens = jnp.array([6, 4])
    base, bl = valle_ar_decode(params, cfg, text, text_lens, pq0, p_lens,
                               ks[2], top_k=1, max_gen_len=G)
    i8, il = valle_ar_decode(params, cfg, text, text_lens, pq0, p_lens,
                             ks[2], top_k=1, max_gen_len=G,
                             kv_cache_int8=True)
    agreement = float((np.asarray(base) == np.asarray(i8)).mean())
    assert agreement > 0.9, agreement


def test_flash_lens_matches_naive_ar_and_nar():
    """Inline-mask flash kernel == naive with the equivalent bias arrays."""
    from valle_tpu.ops import masks as M
    from valle_tpu.ops.attention import flash_attention_lens

    B, H, St, Ta, D = 2, 4, 128, 128, 64
    S = St + Ta
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, S, D))
    v = jax.random.normal(ks[2], (B, H, S, D))
    x_lens = jnp.array([St, 70])
    y_lens = jnp.array([Ta, 90])

    # AR composite mask
    bias = M.ar_xy_attn_bias(x_lens, y_lens, St, Ta)
    ref = naive_attention(q, k, v, bias)
    out = flash_attention_lens(q, k, v, x_lens, y_lens, St, True,
                               128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # NAR padding-only mask
    bias = M.padding_attn_bias(x_lens, y_lens, St, Ta)
    ref = naive_attention(q, k, v, bias)
    out = flash_attention_lens(q, k, v, x_lens, y_lens, St, False,
                               128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # gradients (bwd recomputes via the bias path)
    gf = jax.grad(lambda *a: jnp.sum(flash_attention_lens(
        *a, x_lens, y_lens, St, True, 128, 128, True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    bias = M.ar_xy_attn_bias(x_lens, y_lens, St, Ta)
    gr = jax.grad(lambda *a: jnp.sum(
        naive_attention(*a, bias) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
