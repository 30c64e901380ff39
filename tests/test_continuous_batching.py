"""Continuous batching (slot recycling): parity with the batch decoder,
no state leakage across slot reuse, end-to-end agreement with Synthesizer.

The scheduler is beyond-parity capability (the reference is a batch-1
CLI, /root/reference/valle/models/valle.py:989); correctness is defined
against OUR batch decoder, which itself is exact-parity-tested against
the reference (tests/test_decode_parity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.data import AudioTokenizer, TextTokenizer
from valle_tpu.data.collation import TextTokenCollater
from valle_tpu.models import ValleConfig, ValleModel
from valle_tpu.models.cb_decode import (
    cb_decode_chunk,
    cb_install,
    cb_install_many,
    cb_prefill,
    cb_state_init,
)
from valle_tpu.models.inference import valle_ar_decode
from valle_tpu.serving import ContinuousBatcher, SynthesisRequest, Synthesizer


def tiny_cfg(**kw):
    base = dict(model_name="valle", d_model=32, nhead=2, num_layers=2,
                num_quantizers=8, max_len=512, max_prefix_len=8)
    base.update(kw)
    return ValleConfig(**base)


def _cb_run_no_refill(params, cfg, text, text_lens, prompts, p_lens, rng,
                      *, max_gen_len, top_k, chunk):
    """Admit the whole batch at once and drain — the chunked twin of one
    valle_ar_decode call."""
    B, S = text.shape
    P = prompts.shape[1]
    bos = int(cfg.prepend_bos)
    cache_len = S + bos + P + max_gen_len + 1
    st = cb_state_init(cfg, slots=B, cache_len=cache_len,
                       max_gen_len=max_gen_len, rng=rng)
    for i in range(B):
        k1, v1, lg0 = cb_prefill(
            params, cfg, text[i: i + 1], text_lens[i: i + 1],
            prompts[i: i + 1], p_lens[i: i + 1], cache_len=cache_len)
        st = cb_install(st, jnp.int32(i), k1, v1, lg0,
                        text_lens[i], p_lens[i] + bos)
    while not bool(np.asarray(st["done"]).all()):
        st = cb_decode_chunk(params, st, 1.0, cfg=cfg, S=S, K=chunk,
                             top_k=top_k)
    return np.asarray(st["gen_codes"]), np.asarray(st["gen_lens"])


def test_cb_matches_batch_decode_exactly():
    """All slots admitted up front, multiple chunks: tokens and lengths
    equal valle_ar_decode bit-for-bit — including SAMPLED tokens (the rng
    chain is carried across chunks exactly like the batch while_loop)."""
    cfg = tiny_cfg()
    params, _ = ValleModel(cfg).init(jax.random.PRNGKey(0))
    B, S, P, G = 4, 12, 8, 24
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    text = jax.random.randint(ks[0], (B, S), 0, 100)
    text_lens = jnp.array([S, S - 3, S - 5, S - 1])
    prompts = jax.random.randint(ks[1], (B, P), 0, 1024)
    p_lens = jnp.array([P, P - 2, P - 4, P - 1])

    ref_codes, ref_lens = valle_ar_decode(
        params, cfg, text, text_lens, prompts, p_lens, ks[2],
        top_k=10, max_gen_len=G)
    got_codes, got_lens = _cb_run_no_refill(
        params, cfg, text, text_lens, prompts, p_lens, ks[2],
        max_gen_len=G, top_k=10, chunk=5)

    np.testing.assert_array_equal(np.asarray(ref_lens), got_lens)
    np.testing.assert_array_equal(np.asarray(ref_codes), got_codes)


def test_cb_slot_recycling_no_state_leak():
    """More requests than slots, greedy: every recycled slot's output
    equals that request's own single-request decode — stale cache from
    the previous occupant is never read."""
    cfg = tiny_cfg()
    params, _ = ValleModel(cfg).init(jax.random.PRNGKey(0))
    S, P, G = 12, 8, 24
    N, slots = 5, 2
    bos = int(cfg.prepend_bos)
    cache_len = S + bos + P + G + 1
    ks = jax.random.split(jax.random.PRNGKey(7), 2 * N + 1)
    texts = [jax.random.randint(ks[2 * i], (1, S), 0, 100) for i in range(N)]
    # varied text lengths -> varied 16x stop caps -> staggered finishes
    tlens = [jnp.array([1 + (i % 3)]) for i in range(N)]
    proms = [jax.random.randint(ks[2 * i + 1], (1, P), 0, 1024)
             for i in range(N)]
    plens = [jnp.array([P - (i % 4)]) for i in range(N)]

    st = cb_state_init(cfg, slots=slots, cache_len=cache_len,
                       max_gen_len=G, rng=ks[-1])
    queue = list(range(N))[::-1]
    occupant = [None] * slots
    out = {}

    def install(st, slot, i):
        k1, v1, lg0 = cb_prefill(params, cfg, texts[i], tlens[i],
                                 proms[i], plens[i], cache_len=cache_len)
        occupant[slot] = i
        return cb_install(st, jnp.int32(slot), k1, v1, lg0,
                          tlens[i][0], plens[i][0] + bos)

    for s in range(slots):
        st = install(st, s, queue.pop())
    while any(o is not None for o in occupant):
        st = cb_decode_chunk(params, st, 1.0, cfg=cfg, S=S, K=4, top_k=1)
        done = np.asarray(st["done"])
        gen_codes = np.asarray(st["gen_codes"])
        gen_lens = np.asarray(st["gen_lens"])
        for s in range(slots):
            if occupant[s] is None or not done[s]:
                continue
            out[occupant[s]] = (gen_codes[s].copy(), int(gen_lens[s]))
            occupant[s] = None
            if queue:
                st = install(st, s, queue.pop())

    assert sorted(out) == list(range(N))
    for i in range(N):
        ref_c, ref_l = valle_ar_decode(
            params, cfg, texts[i], tlens[i], proms[i], plens[i],
            jax.random.PRNGKey(99), top_k=1, max_gen_len=G)
        got_c, got_l = out[i]
        assert int(ref_l[0]) == got_l
        np.testing.assert_array_equal(np.asarray(ref_c)[0], got_c)


def test_cb_install_many_matches_sequential_installs():
    """One batched install (with repeat-row-0 padding up to the fixed
    width) leaves the slot table bit-identical to installing each
    request through cb_install — including untouched slots."""
    cfg = tiny_cfg()
    params, _ = ValleModel(cfg).init(jax.random.PRNGKey(0))
    S, P, G, slots = 12, 8, 16, 4
    bos = int(cfg.prepend_bos)
    cache_len = S + bos + P + G + 1
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    b = 2                                   # wave smaller than width
    text = jax.random.randint(ks[0], (b, S), 0, 100)
    text_lens = jnp.array([S, S - 4])
    prompts = jax.random.randint(ks[1], (b, P), 0, 1024)
    p_lens = jnp.array([P, P - 3])
    kb, vb, lg0 = cb_prefill(params, cfg, text, text_lens, prompts,
                             p_lens, cache_len=cache_len)

    target = [3, 1]                         # non-contiguous slots
    st_seq = cb_state_init(cfg, slots=slots, cache_len=cache_len,
                           max_gen_len=G, rng=ks[2])
    # mark a bystander slot live to prove it survives the scatter
    st_seq["done"] = st_seq["done"].at[0].set(False)
    st_seq["g"] = st_seq["g"].at[0].set(7)
    st_many = {k: jnp.array(v) for k, v in st_seq.items()}

    for j, slot in enumerate(target):
        st_seq = cb_install(st_seq, jnp.int32(slot), kb[:, j: j + 1],
                            vb[:, j: j + 1], lg0[j: j + 1],
                            text_lens[j], p_lens[j] + bos)

    pad = slots - b                         # repeat row 0 entirely
    slot_ids = jnp.asarray(target + [target[0]] * pad, jnp.int32)
    rep = lambda a, axis: jnp.concatenate(
        [a, jnp.repeat(jnp.take(a, jnp.array([0]), axis=axis), pad,
                       axis=axis)], axis=axis)
    st_many = cb_install_many(
        st_many, slot_ids, rep(kb, 1), rep(vb, 1), rep(lg0, 0),
        rep(text_lens, 0), rep(p_lens + bos, 0))

    for key in st_seq:
        if key == "rng":
            continue
        np.testing.assert_array_equal(
            np.asarray(st_seq[key]), np.asarray(st_many[key]), err_msg=key)
    assert not bool(st_many["done"][0]) and int(st_many["g"][0]) == 7


@pytest.mark.parametrize("admission", ["lpt", "fifo"])
def test_continuous_batcher_end_to_end_matches_synthesizer(admission):
    """Full pipeline through the scheduler (prefill/install/chunk + NAR
    groups + codec) agrees with Synthesizer under greedy decoding —
    under BOTH admission orders (greedy tokens are per-request
    deterministic, so the schedule must not change values; results
    return in submission order either way)."""
    cfg = tiny_cfg(prefix_mode=1)
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    tokenizer = TextTokenizer(backend="char")
    collater = TextTokenCollater(sorted(set("abcdefghijklmnopqrstuvwxyz_")))
    audio_tok = AudioTokenizer()

    rng = np.random.RandomState(0)
    reqs = [SynthesisRequest(text=t,
                             prompt_codes=rng.randint(0, 1024, (5, 8)))
            for t in ("hello there", "one more", "third request text",
                      "tiny", "fifth and final sentence")]

    synth = Synthesizer(model, params, tokenizer, collater, audio_tok,
                        top_k=1, max_gen_len=16,
                        compute_dtype=jnp.float32)
    cb = ContinuousBatcher(model, params, tokenizer, collater, audio_tok,
                           slots=2, text_pad=32, prompt_pad=8,
                           max_gen_len=16, chunk=4, top_k=1,
                           compute_dtype=jnp.float32, admission=admission)

    ref = synth.synthesize(reqs, max_gen_len=16)
    got = cb.run(reqs)
    assert len(got) == len(reqs)
    for a, b in zip(ref, got):
        assert a.frames == b.frames
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_allclose(a.wav, b.wav, atol=1e-5)


def test_cb_dp_mesh_matches_single_device():
    """DP-mesh continuous batching (slot table sharded over 'data' via
    GSPMD — the CB programs are pure XLA, so no shard_map is needed):
    with slots > requests per wave AND slot recycling in play, every
    result is bit-identical to the mesh=None run — sampled tokens
    included (jax_threefry_partitionable keeps the partitioned rng draws
    equal to the single-device chain)."""
    from valle_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg(prefix_mode=1)
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    tokenizer = TextTokenizer(backend="char")
    collater = TextTokenCollater(sorted(set("abcdefghijklmnopqrstuvwxyz_")))
    audio_tok = AudioTokenizer()

    rng = np.random.RandomState(1)
    reqs = [SynthesisRequest(text=t,
                             prompt_codes=rng.randint(0, 1024, (5, 8)))
            for t in ("hello there", "one more", "third request text",
                      "tiny", "fifth and final sentence", "six",
                      "seventh request", "the eighth and longest of all",
                      "nine", "ten closes it")]

    kw = dict(slots=4, text_pad=32, prompt_pad=8, max_gen_len=16,
              chunk=4, top_k=10, compute_dtype=jnp.float32, seed=11)
    ref = ContinuousBatcher(model, params, tokenizer, collater, audio_tok,
                            **kw).run(reqs)
    got = ContinuousBatcher(
        model, params, tokenizer, collater, audio_tok,
        mesh=make_mesh(dp=4, tp=1, devices=jax.devices()[:4]), **kw
    ).run(reqs)
    assert len(got) == len(reqs)
    for a, b in zip(ref, got):
        assert a.frames == b.frames
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_allclose(a.wav, b.wav, atol=1e-5)


def test_cb_dp_mesh_rejects_bad_shapes():
    from valle_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg()
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    args = (model, params, TextTokenizer(backend="char"),
            TextTokenCollater(sorted(set("abc "))), AudioTokenizer())
    with pytest.raises(ValueError, match="divisible"):
        ContinuousBatcher(*args, slots=3, mesh=make_mesh(
            dp=2, tp=1, devices=jax.devices()[:2]))
    with pytest.raises(ValueError, match="DP-only"):
        ContinuousBatcher(*args, slots=4, mesh=make_mesh(
            dp=2, tp=2, devices=jax.devices()[:4]))


def test_continuous_batcher_rejects_oversized_text():
    cfg = tiny_cfg()
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    cb = ContinuousBatcher(model, params, TextTokenizer(backend="char"),
                           TextTokenCollater(sorted(set("abc "))),
                           AudioTokenizer(), slots=1, text_pad=8,
                           prompt_pad=8, max_gen_len=8)
    import pytest

    with pytest.raises(ValueError):
        cb.run([SynthesisRequest(text="a" * 50)])
