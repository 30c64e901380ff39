"""Data-layer tests: text frontends (reference golden outputs where the
backend is available), collation, manifests + HDF5 storage, bucketing
sampler invariants, dataset batches, prompted features, fbank."""

import numpy as np
import pytest

from valle_tpu.data import (
    AudioTokenConfig,
    Cut,
    CutSet,
    DynamicBucketingSampler,
    FeatureRef,
    Hdf5FeatureStore,
    PromptedFeatures,
    PromptedPrecomputedFeatures,
    SpeechSynthesisDataset,
    TextTokenCollater,
    TextTokenizer,
    get_fbank_extractor,
    tokenize_text,
)
from valle_tpu.data.sampler import SimpleCutSampler


# ---------------------------------------------------------------------------
# Text frontends
# ---------------------------------------------------------------------------


def _has_backend(name):
    try:
        TextTokenizer(backend=name)
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_backend("espeak"),
                    reason="phonemizer/espeak-ng not installed")
def test_espeak_golden():
    """Reference golden outputs (valle/tests/data/tokenizer_test.py:23-38)."""
    tokenizer = TextTokenizer(backend="espeak")
    txt = "The two parties, the sheep and the wolves, met each other."
    sym = ['ð', 'ə', '_', 't', 'uː', '_', 'p', 'ɑːɹ', 'ɾ', 'i', 'z', ',',
           '_', 'ð', 'ə', '_', 'ʃ', 'iː', 'p', '_', 'æ', 'n', 'd', 'ð', 'ə',
           '_', 'w', 'ʊ', 'l', 'v', 'z', ',', '_', 'm', 'ɛ', 't', '_', 'iː',
           'tʃ', '_', 'ʌ', 'ð', 'ɚ', '.']
    assert tokenize_text(tokenizer, txt) == sym


@pytest.mark.skipif(not _has_backend("pypinyin"),
                    reason="pypinyin not installed")
def test_pypinyin_golden():
    tokenizer = TextTokenizer(backend="pypinyin")
    assert tokenize_text(tokenizer, "你好这是测试") == [
        "ni3", "-", "hao3", "-", "zhe4", "-", "shi4", "-", "ce4", "-",
        "shi4"]


def test_char_backend_golden():
    tokenizer = TextTokenizer(backend="char")
    assert tokenize_text(tokenizer, "Hi there!") == [
        "h", "i", "_", "t", "h", "e", "r", "e", "!"]
    # multiple spaces collapse; case folds
    assert tokenize_text(tokenizer, "A  b") == ["a", "_", "b"]


def test_to_list_separator_semantics():
    """to_list drops phone separators and keeps word separators
    (reference tokenizer.py:152-164)."""
    tokenizer = TextTokenizer(backend="char")
    out = tokenizer.to_list("a|b_c|d")
    assert out == ["a", "b", "_", "c", "d"]


# ---------------------------------------------------------------------------
# Collation
# ---------------------------------------------------------------------------


def test_text_token_collater():
    c = TextTokenCollater(["a", "b", "c"], add_bos=True, add_eos=True)
    assert c.idx2token[:3] == ["<pad>", "<bos>", "<eos>"]
    tokens, lens = c.index([["a", "c"], ["b"]])
    assert tokens.shape == (2, 4)
    # <bos> a c <eos> ; <bos> b <eos> <pad>
    np.testing.assert_array_equal(lens, [4, 3])
    assert tokens[1, 3] == 0  # pad id
    tokens2, _ = c.index([["a"]], pad_to=8)
    assert tokens2.shape == (1, 8)


def test_collater_rejects_unknown():
    c = TextTokenCollater(["a"])
    with pytest.raises(AssertionError):
        c.index([["z"]])


# ---------------------------------------------------------------------------
# Manifests + storage + dataset
# ---------------------------------------------------------------------------


def _make_cutset(tmp_path, n=10, q=8):
    rng = np.random.RandomState(0)
    store_path = tmp_path / "feats.h5"
    cuts = []
    with Hdf5FeatureStore(store_path).writer() as w:
        for i in range(n):
            frames = rng.randint(50, 200)
            codes = rng.randint(0, 1024, size=(frames, q)).astype(np.int16)
            w.write(f"utt{i}", codes)
            cuts.append(Cut(
                id=f"spk{i % 2}_book_{i:03d}_000",
                duration=frames * 320 / 24000,
                text=f"utterance {i}",
                tokens=list("hello")[: 3 + i % 3],
                speaker=f"spk{i % 2}",
                features=FeatureRef(str(store_path), f"utt{i}", frames, q,
                                    320 / 24000)))
    return CutSet(cuts)


def test_cutset_roundtrip(tmp_path):
    cs = _make_cutset(tmp_path)
    p = tmp_path / "cuts.jsonl.gz"
    cs.to_file(p)
    cs2 = CutSet.from_file(p)
    assert len(cs2) == len(cs)
    assert cs2[0].id == cs[0].id
    np.testing.assert_array_equal(cs2[0].load_features(),
                                  cs[0].load_features())
    assert "Cuts count: 10" in cs.describe()


def test_bucketing_sampler_budget_and_static_shapes(tmp_path):
    cs = _make_cutset(tmp_path, n=40)
    sampler = DynamicBucketingSampler(
        cs, max_duration=6.0, num_buckets=3, shuffle=True, seed=1)
    seen = set()
    shapes = set()
    for batch in sampler:
        assert len(batch.cuts) >= 1
        cost = sum(c.duration + c.duration ** 2 / 10 for c in batch.cuts)
        assert cost <= 6.0 + max(c.duration + c.duration ** 2 / 10
                                 for c in batch.cuts)
        for c in batch.cuts:
            seen.add(c.id)
        shapes.add((batch.pad_audio_to, batch.pad_text_to))
        assert batch.pad_audio_to % 32 == 0
        assert batch.pad_audio_to >= max(
            c.features.num_frames for c in batch.cuts)
    assert len(seen) == 40  # every cut appears
    assert len(shapes) <= 6  # bounded compiled-shape set


def test_spec_augment():
    from valle_tpu.data.augment import SpecAugment

    rng = np.random.RandomState(0)
    feats = rng.randn(3, 400, 100).astype(np.float32) + 5.0
    lens = np.array([400, 300, 220], np.int32)
    aug = SpecAugment(p=1.0, seed=1)
    out = aug(feats, lens)
    assert out.shape == feats.shape
    assert not np.array_equal(out, feats)        # something changed
    assert np.array_equal(feats, feats)          # input not mutated
    # masked regions exist (features are all > 1 pre-mask)
    assert (np.abs(out) < 1e-12).sum() > 0
    # deterministic per seed
    out2 = SpecAugment(p=1.0, seed=1)(feats, lens)
    np.testing.assert_array_equal(out, out2)
    # integer (codec) features pass through untouched
    codes = rng.randint(0, 1024, (2, 50, 8)).astype(np.int16)
    np.testing.assert_array_equal(aug(codes), codes)


def test_on_the_fly_features(tmp_path):
    from valle_tpu import native
    from valle_tpu.data.fbank import get_fbank_extractor
    from valle_tpu.data.input_strategies import OnTheFlyFeatures
    from valle_tpu.data.manifests import RecordingRef

    sr = 24000
    cuts = []
    for i, n in enumerate((24000, 12000)):
        wav = (0.3 * np.sin(2 * np.pi * 330 * np.arange(n) / sr)
               ).astype(np.float32)
        p = tmp_path / f"otf{i}.wav"
        native.write_wav(p, wav, sr)
        cuts.append(Cut(id=f"otf{i}", duration=n / sr, text="x",
                        tokens=["x"],
                        recording=RecordingRef(str(p), sr, n)))
    extractor = get_fbank_extractor()
    feats, lens = OnTheFlyFeatures(extractor)(cuts)
    assert feats.shape[0] == 2 and feats.shape[2] == 100
    assert feats.dtype == np.float32
    # matches direct extraction
    wav0 = cuts[0].load_audio()
    direct = extractor.extract(wav0, sr)
    np.testing.assert_allclose(feats[0, :lens[0]], direct, rtol=1e-6)
    assert lens[1] < lens[0]
    assert np.all(feats[1, lens[1]:] == 0)


def test_sampler_fast_forward_resume(tmp_path):
    """Mid-epoch resume skips already-consumed batches (reference
    trainer.py:346-364 restores lhotse sampler state)."""
    cs = _make_cutset(tmp_path, n=40)

    def fresh():
        s = DynamicBucketingSampler(cs, max_duration=6.0, num_buckets=2,
                                    shuffle=True, seed=7)
        s.set_epoch(3)
        return s

    full = [[c.id for c in b.cuts] for b in fresh()]
    assert len(full) > 4

    # consume 3 batches, snapshot, resume in a NEW sampler
    s1 = fresh()
    it = iter(s1)
    for _ in range(3):
        next(it)
    sd = s1.state_dict()
    assert sd["consumed"] == 3 and sd["epoch"] == 3

    s2 = fresh()
    s2.load_state_dict(sd)
    s2.set_epoch(3)  # trainer calls set_epoch after restore
    resumed = [[c.id for c in b.cuts] for b in s2]
    assert resumed == full[3:]  # not a replay from the top

    # a later epoch starts from the beginning again
    s2.set_epoch(4)
    epoch4 = [[c.id for c in b.cuts] for b in s2]
    assert len(epoch4) == len([1 for _ in fresh()]) or len(epoch4) > 0
    s3 = fresh()
    s3.set_epoch(4)
    assert epoch4 == [[c.id for c in b.cuts] for b in s3]


def test_sampler_dp_sharding(tmp_path):
    cs = _make_cutset(tmp_path, n=40)
    ids0, ids1 = set(), set()
    counts = {}
    for rank, acc in ((0, ids0), (1, ids1)):
        s = DynamicBucketingSampler(cs, max_duration=6.0, num_buckets=2,
                                    shuffle=True, seed=3, world_size=2,
                                    rank=rank)
        n = 0
        for b in s:
            acc.update(c.id for c in b.cuts)
            n += 1
        counts[rank] = n
    assert ids0.isdisjoint(ids1)
    # EQUAL batch counts per rank (an uneven split would deadlock the
    # multihost SPMD step); the uneven tail batch may be dropped
    assert counts[0] == counts[1]
    assert len(ids0 | ids1) >= 40 - 8  # at most one tail batch dropped


def test_dataset_batches(tmp_path):
    cs = _make_cutset(tmp_path)
    collater = TextTokenCollater(sorted({t for c in cs for t in c.tokens}))
    ds = SpeechSynthesisDataset(collater)
    sampler = SimpleCutSampler(cs, max_duration=10.0)
    batch = next(iter(
        __import__("valle_tpu.data", fromlist=["DataLoader"]).DataLoader(
            ds, sampler, num_workers=1)))
    B = len(batch["utt_id"])
    assert batch["audio_features"].shape[0] == B
    assert batch["audio_features"].shape[2] == 8
    assert batch["text_tokens"].shape[0] == B
    assert batch["audio_features_lens"].max() <= batch[
        "audio_features"].shape[1]


def test_prompted_features(tmp_path):
    cs = _make_cutset(tmp_path, n=8)
    strat = PromptedPrecomputedFeatures("libritts", cs)
    cuts = list(cs)[:4]
    feats, lens = strat(cuts)
    assert isinstance(feats, PromptedFeatures)
    prompts, features = feats.data
    p_lens, f_lens = lens.data
    assert prompts.shape[0] == features.shape[0] == 4
    assert int(p_lens.min()) == int(p_lens.max())  # equal prompt lens
    assert prompts.shape[1] <= int(3.0 / (320 / 24000))  # <= 3 s


def test_fbank_shapes():
    fb = get_fbank_extractor()
    sr = 24000
    y = np.random.RandomState(0).randn(sr // 2).astype(np.float32) * 0.1
    feats = fb.extract(y, sr)
    assert feats.shape[1] == 100
    # lhotse frame count for 0.5 s at hop 256
    assert abs(feats.shape[0] - round(0.5 * sr / 256)) <= 1
    assert np.isfinite(feats).all()
    assert feats.min() >= np.log(1e-5) - 1e-6


def test_dataloader_state_counts_delivered_not_prefetched(tmp_path):
    """Mid-epoch checkpoint state must count batches DELIVERED to the
    trainer; the worker pool prefetches ahead of training."""
    import time

    from valle_tpu.data.datamodule import DataLoader

    cs = _make_cutset(tmp_path, n=40)
    collater = TextTokenCollater(sorted({t for c in cs for t in c.tokens}))
    ds = SpeechSynthesisDataset(collater)
    sampler = DynamicBucketingSampler(cs, max_duration=6.0, num_buckets=2,
                                      shuffle=True, seed=3)
    dl = DataLoader(ds, sampler, num_workers=2, prefetch=4)
    it = iter(dl)
    for _ in range(3):
        next(it)
    time.sleep(0.3)  # let the pool run ahead
    assert dl.state_dict()["consumed"] == 3
    # resume from that state replays from batch 4 (not from the top and
    # not past prefetched batches)
    n_total = sum(1 for _ in DynamicBucketingSampler(
        cs, max_duration=6.0, num_buckets=2, shuffle=True, seed=3))
    sampler2 = DynamicBucketingSampler(cs, max_duration=6.0, num_buckets=2,
                                       shuffle=True, seed=3)
    sampler2.load_state_dict(dl.state_dict())
    rest = sum(1 for _ in sampler2)
    assert rest == n_total - 3
    it.close()


def test_prompted_features_static_shapes_through_dataset(tmp_path):
    """PromptedFeatures batches must come out of the dataset at STATIC
    shapes: prompts padded to one fixed grid (240) and features to the
    sampler's pad_audio_to — per-batch dynamic shapes recompile the
    jitted train step every batch."""
    cs = _make_cutset(tmp_path, n=12)
    collater = TextTokenCollater(sorted({t for c in cs for t in c.tokens}))
    strat = PromptedPrecomputedFeatures("libritts", cs)
    ds = SpeechSynthesisDataset(collater, feature_input_strategy=strat)
    cuts = list(cs)
    b1 = ds.__getitem__(cuts[:4], pad_audio_to=256, pad_text_to=16)
    b2 = ds.__getitem__(cuts[4:8], pad_audio_to=256, pad_text_to=16)
    p1, f1 = b1["audio_features"].data
    p2, f2 = b2["audio_features"].data
    assert p1.shape[1] == p2.shape[1] == 240
    assert f1.shape[1] == f2.shape[1] == 256


def test_parallel_phonemize_matches_serial():
    """--text-workers fan-out must produce IDENTICAL tokens to the serial
    path (char backend — the always-available frontend; espeak/pypinyin
    workers use the same pool machinery)."""
    from valle_tpu.bin.tokenizer import phonemize_texts

    texts = [f"hello world {i} sample text" for i in range(12)]
    serial = phonemize_texts(texts, language="en-us", backend="char",
                             workers=0)
    # char normally short-circuits to serial (pool can't pay for it);
    # _force_pool exercises the real worker-pool path in tests
    parallel = phonemize_texts(texts, language="en-us", backend="char",
                               workers=2, _force_pool=True)
    assert serial == parallel
    assert serial[0] == list("hello_world_0_sample_text")
