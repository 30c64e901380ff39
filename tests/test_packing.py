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


def _bucketed_nar_loss(params, cfg, segs, nar_stage, prefix_len):
    """Bucketed-path NAR loss over the same segments, one row each."""
    B = len(segs)
    S = max(len(t) for t, _ in segs)
    T = max(len(q) for _, q in segs)
    batch = {
        "text": np.zeros((B, S), np.int32),
        "text_lens": np.array([len(t) for t, _ in segs], np.int32),
        "audio": np.zeros((B, T, 8), np.int32),
        "audio_lens": np.array([len(q) for _, q in segs], np.int32),
    }
    for i, (t, q) in enumerate(segs):
        batch["text"][i, : len(t)] = t
        batch["audio"][i, : q.shape[0]] = q
    loss, metrics, _ = valle_forward(
        params, cfg, {k: jnp.asarray(v) for k, v in batch.items()},
        train_stage=2, rng=None, deterministic=True,
        compute_dtype=jnp.float32, nar_stage=nar_stage,
        nar_prefix_len=prefix_len)
    return float(metrics["nar_loss"]), float(metrics["NarTop10Accuracy"])


def _packed_nar_batch(segs_rows, S, T, max_segments=8):
    B = len(segs_rows)
    batch = {
        "text": np.zeros((B, S), np.int32),
        "text_seg": np.full((B, S), -1, np.int32),
        "text_pos": np.zeros((B, S), np.int32),
        "nar_codes": np.zeros((B, T, 8), np.int32),
        "audio_seg": np.full((B, T), -1, np.int32),
        "audio_pos": np.zeros((B, T), np.int32),
        "seg_frames": np.zeros((B, max_segments), np.int32),
        "row_frames": np.zeros((B,), np.int32),
    }
    for r, row in enumerate(segs_rows):
        s_off = t_off = 0
        for si, (text_ids, codes) in enumerate(row):
            L, Lf = len(text_ids), codes.shape[0]
            batch["text"][r, s_off:s_off + L] = text_ids
            batch["text_seg"][r, s_off:s_off + L] = si
            batch["text_pos"][r, s_off:s_off + L] = np.arange(L)
            s_off += L
            batch["nar_codes"][r, t_off:t_off + Lf] = codes
            batch["audio_seg"][r, t_off:t_off + Lf] = si
            batch["audio_pos"][r, t_off:t_off + Lf] = np.arange(Lf)
            batch["seg_frames"][r, si] = Lf
            batch["row_frames"][r] += Lf
            t_off += Lf
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.parametrize("prefix_mode,share", [(0, False), (1, False),
                                               (1, True)])
def test_packed_nar_matches_bucketed_forward(prefix_mode, share):
    """Packed NAR loss == the bucketed NAR forward over the same segments
    (one per row), with the stage and the shared prefix length pinned —
    per-segment math is identical, only the float summation order differs."""
    from valle_tpu.models.valle import valle_nar_forward_packed

    cfg = ValleConfig(d_model=64, nhead=4, num_layers=2,
                      prefix_mode=prefix_mode, num_quantizers=8,
                      max_len=512, share_embedding=share)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(11)
    segs = []
    for L, Lf in ((5, 12), (7, 9), (4, 16)):
        segs.append((rng.randint(3, 90, size=L),
                     rng.randint(0, 1024, size=(Lf, 8))))

    nar_stage, prefix_len = 3, 2
    want_loss, want_acc = _bucketed_nar_loss(params, cfg, segs,
                                             nar_stage, prefix_len)

    batch = _packed_nar_batch([segs], S=32, T=48)
    loss, metrics, _ = valle_nar_forward_packed(
        params, cfg, batch, rng=None, deterministic=True,
        compute_dtype=jnp.float32, nar_stage=nar_stage,
        nar_prefix_len=prefix_len)
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["NarTop10Accuracy"]),
                               want_acc, rtol=1e-5)
    assert float(metrics["frames"]) == sum(q.shape[0] for _, q in segs)
    assert float(metrics["utterances"]) == len(segs)


def test_packed_nar_multirow_empty_row_and_rng_draws():
    from valle_tpu.models.valle import valle_nar_forward_packed

    cfg = ValleConfig(d_model=64, nhead=4, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512)
    params, _ = init_valle(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(5)
    rows = [
        [(rng.randint(3, 90, size=6), rng.randint(0, 1024, size=(10, 8))),
         (rng.randint(3, 90, size=5), rng.randint(0, 1024, size=(8, 8)))],
        [(rng.randint(3, 90, size=9), rng.randint(0, 1024, size=(14, 8)))],
        [],  # padding row (batch tail)
    ]
    want, _ = _bucketed_nar_loss(
        params, cfg, [s for row in rows for s in row], 5, 2)
    batch = _packed_nar_batch(rows, S=24, T=24)
    loss, metrics, _ = valle_nar_forward_packed(
        params, cfg, batch, rng=None, deterministic=True,
        compute_dtype=jnp.float32, nar_stage=5, nar_prefix_len=2)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    assert float(metrics["utterances"]) == 3

    # in-model draws (training path): finite loss, gradable
    loss2, _, _ = valle_nar_forward_packed(
        params, cfg, batch, rng=jax.random.PRNGKey(3),
        deterministic=False, compute_dtype=jnp.float32)
    assert np.isfinite(float(loss2))


def test_packed_nar_dataset_contract(tmp_path):
    import h5py

    from valle_tpu.data.collation import TextTokenCollater
    from valle_tpu.data.manifests import Cut, CutSet, FeatureRef
    from valle_tpu.data.packing import (
        PackedNarSpeechDataset,
        SequencePackingSampler,
    )

    rng = np.random.RandomState(2)
    h5 = tmp_path / "feats.h5"
    cuts = []
    with h5py.File(h5, "w") as f:
        for i in range(9):
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
    sampler = SequencePackingSampler(
        CutSet(cuts), max_frames=40, max_text=16, rows_per_batch=2, seed=4)
    batches = list(sampler)
    ds = PackedNarSpeechDataset(TextTokenCollater(list("abcd")))
    batch = ds.__getitem__(batches[0].cuts, pad_audio_to=40, pad_text_to=16)
    assert batch["nar_codes"].shape == (2, 40, 8)
    assert batch["seg_frames"].shape == (2, 64)
    first = batches[0].cuts[0][0]
    nf = first.features.num_frames
    with h5py.File(h5, "r") as f:
        np.testing.assert_array_equal(batch["nar_codes"][0, :nf], f[first.id])
    assert batch["seg_frames"][0, 0] == nf
    assert (batch["audio_seg"][0, :nf] == 0).all()
    # empty-slot seg_frames stay 0; row_frames sums segments
    assert batch["row_frames"][0] == batch["seg_frames"][0].sum()


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
