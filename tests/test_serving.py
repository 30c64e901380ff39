"""Batch serving layer: multiple concurrent requests -> wavs."""

import jax
import numpy as np

from valle_tpu.data import AudioTokenizer, TextTokenizer
from valle_tpu.data.collation import TextTokenCollater
from valle_tpu.models import ValleConfig, ValleModel
from valle_tpu.serving import SynthesisRequest, Synthesizer


def test_synthesize_batch(tmp_path):
    cfg = ValleConfig(d_model=32, nhead=2, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512, max_prefix_len=8)
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))

    tokenizer = TextTokenizer(backend="char")
    symbols = sorted(set("abcdefghijklmnopqrstuvwxyz_!.?"))
    collater = TextTokenCollater(symbols)
    audio_tok = AudioTokenizer()  # random codec weights: structural test

    synth = Synthesizer(model, params, tokenizer, collater, audio_tok,
                        top_k=5, max_gen_len=32,
                        compute_dtype=jax.numpy.float32)

    rng = np.random.RandomState(0)
    reqs = [
        SynthesisRequest(text="hello world",
                         prompt_codes=rng.randint(0, 1024, (6, 8))),
        SynthesisRequest(text="a longer different sentence here",
                         prompt_codes=rng.randint(0, 1024, (4, 8))),
        SynthesisRequest(text="short"),  # no prompt at all
    ]
    results = synth.synthesize(reqs, max_gen_len=16)
    assert len(results) == 3
    for r in results:
        assert r.codes.shape[1] == 8
        assert r.frames == r.codes.shape[0]
        assert r.wav.shape[0] == r.frames * 320
        assert np.isfinite(r.wav).all()

    # second call reuses compiled programs (same bucket shapes)
    results2 = synth.synthesize(reqs[:2], max_gen_len=16)
    assert len(results2) == 2


def test_synthesize_batch_dp_mesh():
    """DP-sharded serving over the virtual 8-device mesh: identical tokens
    to the single-device path."""
    import jax.numpy as jnp

    from valle_tpu.parallel.mesh import make_mesh

    cfg = ValleConfig(d_model=32, nhead=2, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512, max_prefix_len=8)
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    tokenizer = TextTokenizer(backend="char")
    collater = TextTokenCollater(sorted(set("abcdefghijklmnopqrstuvwxyz_")))
    audio_tok = AudioTokenizer()

    rng = np.random.RandomState(0)
    reqs = [SynthesisRequest(text=t, prompt_codes=rng.randint(0, 1024, (5, 8)))
            for t in ("hello there", "another one", "third request")]

    base = Synthesizer(model, params, tokenizer, collater, audio_tok,
                       top_k=5, max_gen_len=32, compute_dtype=jnp.float32,
                       seed=7)
    sharded = Synthesizer(model, params, tokenizer, collater, audio_tok,
                          top_k=5, max_gen_len=32,
                          compute_dtype=jnp.float32, seed=7,
                          mesh=make_mesh(tp=1))
    r0 = base.synthesize(reqs, max_gen_len=16)
    r1 = sharded.synthesize(reqs, max_gen_len=16)  # 3 reqs pad to 8 shards
    assert len(r1) == 3
    for a, b in zip(r0, r1):
        np.testing.assert_array_equal(a.codes, b.codes)

    import pytest

    # kernel modes are allowed on DP-only meshes (shard_map path, see
    # test_synthesize_dp_mesh_kernel_modes) but still refuse TP shards
    with pytest.raises(ValueError):
        Synthesizer(model, params, tokenizer, collater, audio_tok,
                    decode_mode="int8", mesh=make_mesh(tp=2))


def test_resolve_nar_attn_impl_policy():
    import jax

    from valle_tpu.serving import resolve_nar_attn_impl

    # explicit values pass through
    assert resolve_nar_attn_impl("flash", 32) == "flash"
    assert resolve_nar_attn_impl("einsum", 1) == "einsum"
    # auto: flash at B <= 8 on TPU only; einsum for vallf and non-TPU
    on_tpu = jax.default_backend() == "tpu"
    assert resolve_nar_attn_impl("auto", 8) == (
        "flash" if on_tpu else "einsum")
    assert resolve_nar_attn_impl("auto", 32) == "einsum"
    assert resolve_nar_attn_impl("auto", 4, "vallf") == "einsum"
    import pytest

    with pytest.raises(ValueError):
        resolve_nar_attn_impl("bogus", 8)


def test_resolve_nar_score_bf16_policy():
    import jax.numpy as jnp
    import pytest

    from valle_tpu.serving import resolve_nar_score_bf16

    assert resolve_nar_score_bf16("auto", jnp.bfloat16) is True
    assert resolve_nar_score_bf16("auto", jnp.float32) is False
    assert resolve_nar_score_bf16("on", jnp.float32) is True
    assert resolve_nar_score_bf16("off", jnp.bfloat16) is False
    assert resolve_nar_score_bf16(True, jnp.float32) is True
    with pytest.raises(ValueError):
        resolve_nar_score_bf16("maybe", jnp.bfloat16)


def test_synthesize_dp_mesh_kernel_modes():
    """Pallas kernel decode modes on a DP-only mesh run under shard_map
    (GSPMD cannot partition a custom call): every device executes the
    full kernel program on its B/dp rows. Greedy (top-1) tokens must be
    exactly the single-device tokens; TP meshes must still refuse."""
    import jax.numpy as jnp
    import pytest

    from valle_tpu.parallel.mesh import make_mesh

    # 128-aligned dims so the fused kernels actually engage (unaligned
    # models silently fall back to the unrolled dense path)
    cfg = ValleConfig(d_model=128, nhead=2, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512, max_prefix_len=8)
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    tokenizer = TextTokenizer(backend="char")
    collater = TextTokenCollater(sorted(set("abcdefghijklmnopqrstuvwxyz_")))
    audio_tok = AudioTokenizer()

    rng = np.random.RandomState(0)
    reqs = [SynthesisRequest(text=t, prompt_codes=rng.randint(0, 1024, (5, 8)))
            for t in ("hello there", "another one", "third request")]

    kw = dict(top_k=1, max_gen_len=16, compute_dtype=jnp.float32, seed=7)
    base = Synthesizer(model, params, tokenizer, collater, audio_tok,
                       decode_mode="fused", **kw)
    sharded = Synthesizer(model, params, tokenizer, collater, audio_tok,
                          decode_mode="fused", mesh=make_mesh(tp=1), **kw)
    r0 = base.synthesize(reqs, max_gen_len=12)
    r1 = sharded.synthesize(reqs, max_gen_len=12)
    assert len(r1) == 3
    for a, b in zip(r0, r1):
        np.testing.assert_array_equal(a.codes, b.codes)

    # auto mode resolves against the per-shard batch and runs end to end
    auto = Synthesizer(model, params, tokenizer, collater, audio_tok,
                       decode_mode="auto", mesh=make_mesh(tp=1), **kw)
    r2 = auto.synthesize(reqs, max_gen_len=12)
    assert len(r2) == 3 and all(r.frames > 0 for r in r2)

    # tensor parallelism still cannot feed a single-device kernel
    with pytest.raises(ValueError):
        Synthesizer(model, params, tokenizer, collater, audio_tok,
                    decode_mode="fused", mesh=make_mesh(tp=2), **kw)
