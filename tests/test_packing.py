"""Sequence-packed AR training: exact parity with per-utterance forwards.

The packed row math must match ``valle_forward``'s AR branch segment by
segment: packed loss over a row == sum of exact-length (pad-free) unpacked
AR losses of its segments. (A PADDED unpacked batch additionally counts
EOS-after-EOS pad positions — reference valle.py:877 uses no ignore_index —
so the comparison is against exact-length batches.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from valle_tpu.models import ValleConfig, init_valle
from valle_tpu.models.valle import valle_ar_forward_packed, valle_forward


def _unpacked_ar_loss(params, cfg, text_ids, q0):
    batch = {
        "text": jnp.asarray(text_ids, jnp.int32)[None],
        "text_lens": jnp.array([len(text_ids)], jnp.int32),
        "audio": jnp.asarray(q0, jnp.int32)[None, :, None].repeat(
            cfg.num_quantizers, axis=2),
        "audio_lens": jnp.array([len(q0)], jnp.int32),
    }
    loss, metrics, _ = valle_forward(
        params, cfg, batch, train_stage=1, rng=None, deterministic=True,
        compute_dtype=jnp.float32)
    return float(metrics["ar_loss"])


def _packed_batch(cfg, segments, S, T):
    """segments: list of rows; each row a list of (text_ids, q0)."""
    B = len(segments)
    bos = int(cfg.prepend_bos)
    batch = {
        "text": np.zeros((B, S), np.int32),
        "text_seg": np.full((B, S), -1, np.int32),
        "text_pos": np.zeros((B, S), np.int32),
        "ar_inputs": np.zeros((B, T), np.int32),
        "ar_targets": np.full((B, T), -1, np.int32),
        "audio_seg": np.full((B, T), -1, np.int32),
        "audio_pos": np.zeros((B, T), np.int32),
        "row_frames": np.zeros((B,), np.int32),
    }
    for r, row in enumerate(segments):
        s_off = t_off = 0
        for si, (text_ids, q0) in enumerate(row):
            L = len(text_ids)
            batch["text"][r, s_off:s_off + L] = text_ids
            batch["text_seg"][r, s_off:s_off + L] = si
            batch["text_pos"][r, s_off:s_off + L] = np.arange(L)
            s_off += L
            if bos:
                inputs = np.concatenate([[cfg.bos_id], q0])
                targets = np.concatenate([q0, [cfg.eos_id]])
            else:
                inputs = np.asarray(q0)
                targets = np.concatenate([q0[1:], [cfg.eos_id]])
            Li = len(inputs)
            batch["ar_inputs"][r, t_off:t_off + Li] = inputs
            batch["ar_targets"][r, t_off:t_off + Li] = targets
            batch["audio_seg"][r, t_off:t_off + Li] = si
            batch["audio_pos"][r, t_off:t_off + Li] = np.arange(Li)
            batch["row_frames"][r] += len(q0)
            t_off += Li
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.parametrize("prepend_bos", [False, True])
def test_packed_row_matches_sum_of_exact_length_forwards(prepend_bos):
    cfg = ValleConfig(d_model=64, nhead=4, num_layers=2, prefix_mode=0,
                      num_quantizers=8, max_len=512,
                      prepend_bos=prepend_bos)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    segs = []
    for L, Lf in ((5, 9), (7, 6), (4, 11)):
        segs.append((rng.randint(3, 90, size=L),
                     rng.randint(0, 1024, size=Lf)))

    expected = sum(
        _unpacked_ar_loss(params, cfg, t, q) for t, q in segs)

    batch = _packed_batch(cfg, [segs], S=32, T=48)
    loss, metrics, _ = valle_ar_forward_packed(
        params, cfg, batch, rng=None, deterministic=True,
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    assert float(metrics["frames"]) == sum(len(q) for _, q in segs)
    assert float(metrics["utterances"]) == len(segs)


def test_packed_multirow_with_empty_row():
    cfg = ValleConfig(d_model=64, nhead=4, num_layers=2, prefix_mode=0,
                      num_quantizers=8, max_len=512)
    params, _ = init_valle(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(3)
    rows = [
        [(rng.randint(3, 90, size=6), rng.randint(0, 1024, size=8)),
         (rng.randint(3, 90, size=5), rng.randint(0, 1024, size=7))],
        [(rng.randint(3, 90, size=9), rng.randint(0, 1024, size=12))],
        [],  # padding row (batch tail)
    ]
    expected = sum(_unpacked_ar_loss(params, cfg, t, q)
                   for row in rows for t, q in row)
    batch = _packed_batch(cfg, rows, S=24, T=24)
    loss, metrics, _ = valle_ar_forward_packed(
        params, cfg, batch, rng=None, deterministic=True,
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    assert np.isfinite(float(loss))


def test_packing_sampler_and_dataset_contract(tmp_path):
    import h5py

    from valle_tpu.data.collation import TextTokenCollater
    from valle_tpu.data.manifests import Cut, CutSet, FeatureRef
    from valle_tpu.data.packing import (
        PackedSpeechDataset,
        SequencePackingSampler,
    )

    rng = np.random.RandomState(0)
    h5 = tmp_path / "feats.h5"
    cuts = []
    with h5py.File(h5, "w") as f:
        for i in range(13):
            nf = int(rng.randint(4, 20))
            codes = rng.randint(0, 1024, size=(nf, 8))
            f.create_dataset(f"utt{i}", data=codes)
            cuts.append(Cut(
                id=f"utt{i}", duration=nf * 320.0 / 24000,
                text="x", tokens=list("abcd")[: int(rng.randint(2, 5))],
                features=FeatureRef(
                    storage_path=str(h5), storage_key=f"utt{i}",
                    num_frames=nf, num_features=8,
                    frame_shift=320.0 / 24000)))
    cutset = CutSet(cuts)

    sampler = SequencePackingSampler(
        cutset, max_frames=40, max_text=16, rows_per_batch=2, seed=5)
    batches = list(sampler)
    seen = [c.id for b in batches for row in b.cuts for c in row]
    assert sorted(seen) == sorted(c.id for c in cuts)  # exact cover
    for b in batches:
        assert len(b.cuts) == 2
        for row in b.cuts:
            bos = 0
            assert sum(c.features.num_frames + bos for c in row) <= 40
            assert sum(len(c.tokens) + 2 for c in row) <= 16

    collater = TextTokenCollater(list("abcd"))
    ds = PackedSpeechDataset(collater, eos_id=1024)
    batch = ds.__getitem__(batches[0].cuts, pad_audio_to=40, pad_text_to=16)
    assert batch["ar_inputs"].shape == (2, 40)
    assert batch["text"].shape == (2, 16)
    first = batches[0].cuts[0][0]
    nf = first.features.num_frames
    assert batch["row_frames"][0] == sum(
        c.features.num_frames for c in batches[0].cuts[0])
    # targets: next-token with EOS at the segment end
    with h5py.File(h5, "r") as f:
        q0 = f[first.id][:, 0]
    np.testing.assert_array_equal(batch["ar_inputs"][0, :nf], q0)
    np.testing.assert_array_equal(batch["ar_targets"][0, :nf - 1], q0[1:])
    assert batch["ar_targets"][0, nf - 1] == 1024

    # intra-epoch fast-forward resume
    sampler2 = SequencePackingSampler(
        cutset, max_frames=40, max_text=16, rows_per_batch=2, seed=5)
    it = iter(sampler2)
    next(it)
    sd = sampler2.state_dict()
    sampler3 = SequencePackingSampler(
        cutset, max_frames=40, max_text=16, rows_per_batch=2, seed=5)
    sampler3.load_state_dict(sd)
    resumed = list(sampler3)
    assert len(resumed) == len(batches) - 1
    assert [c.id for row in resumed[0].cuts for c in row] == \
        [c.id for row in batches[1].cuts for c in row]
