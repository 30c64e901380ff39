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
