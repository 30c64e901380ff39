"""End-to-end pipeline: raw wavs+text -> offline tokenizer CLI -> trainer
CLI (few steps, all stages incl. stage-switch resume) -> infer CLI -> wav.

This is the integration test the reference lacks (it only has manual
LJSpeech runs, SURVEY §4); everything goes through the real argparse
surfaces of the CLIs.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from valle_tpu import native
from valle_tpu.data.manifests import Cut, CutSet, RecordingRef


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """12 synthetic utterances (sine chirps) with texts + raw manifests."""
    root = tmp_path_factory.mktemp("e2e")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.RandomState(0)
    texts = [
        "hello world", "testing speech", "one two three", "a b c",
        "synthesis works", "tiny data", "more text here", "sample utterance",
        "the quick fox", "jumps over", "lazy dogs", "end of data",
    ]
    cuts = []
    for i, text in enumerate(texts):
        sr = 24_000
        dur = 0.4 + 0.08 * (i % 5)
        n = int(dur * sr)
        t = np.arange(n) / sr
        f0 = 200 + 50 * (i % 4)
        wav = (0.3 * np.sin(2 * np.pi * f0 * t)
               + 0.05 * rng.randn(n)).astype(np.float32)
        path = wav_dir / f"utt{i:02d}.wav"
        native.write_wav(path, wav, sr)
        cuts.append(Cut(
            id=f"spk{i % 2}_000_{i:03d}_000",
            duration=n / sr,
            text=text,
            speaker=f"spk{i % 2}",
            recording=RecordingRef(str(path), sr, n)))
    man_dir = root / "manifests"
    CutSet(cuts[:8]).to_file(man_dir / "cuts_train.jsonl.gz")
    CutSet(cuts[8:10]).to_file(man_dir / "cuts_dev.jsonl.gz")
    CutSet(cuts[10:]).to_file(man_dir / "cuts_test.jsonl.gz")
    return root


@pytest.fixture(scope="module")
def tokenized_dir(dataset_dir):
    from valle_tpu.bin.tokenizer import main as tok_main

    out = dataset_dir / "tokenized"
    argv = [
        "tokenizer",
        "--src-dir", str(dataset_dir / "manifests"),
        "--output-dir", str(out),
        "--text-extractor", "char",
        "--audio-extractor", "Encodec",
        "--batch-duration", "2.0",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        tok_main()
    finally:
        sys.argv = old

    assert (out / "cuts_train.jsonl.gz").exists()
    assert (out / "unique_text_tokens.k2symbols").exists()
    cuts = CutSet.from_file(out / "cuts_train.jsonl.gz")
    assert len(cuts) == 8
    c = cuts[0]
    assert c.tokens is not None and len(c.tokens) > 0
    feats = c.load_features()
    assert feats.shape[1] == 8  # 8 quantizers
    assert feats.shape[0] == c.features.num_frames
    return out


def _trainer_args(dataset_dir, tokenized_dir, exp_dir, stage, epochs=1,
                  start_epoch=1, extra=()):
    return [
        "trainer",
        "--manifest-dir", str(tokenized_dir),
        "--text-tokens", str(tokenized_dir / "unique_text_tokens.k2symbols"),
        "--exp-dir", str(exp_dir),
        "--decoder-dim", "32", "--nhead", "2", "--num-decoder-layers", "2",
        "--model-name", "valle", "--prefix-mode", "1",
        "--train-stage", str(stage),
        "--num-epochs", str(epochs), "--start-epoch", str(start_epoch),
        "--max-duration", "6", "--num-buckets", "2",
        "--filter-min-duration", "0.1", "--filter-max-duration", "5.0",
        "--base-lr", "0.05", "--warmup-steps", "10",
        "--save-every-n", "4", "--valid-interval", "4",
        "--log-interval", "2", "--num-workers", "0",
        "--max-steps-per-epoch", "4",
        "--tensorboard", "false", "--oom-check", "true",
        "--accumulate-grad-steps", "1",
        *extra,
    ]


def _run_main(mod_main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        mod_main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def trained_dir(dataset_dir, tokenized_dir):
    from valle_tpu.bin.trainer import main as trainer_main

    exp = dataset_dir / "exp"
    # stage 1 (AR)
    _run_main(trainer_main,
              _trainer_args(dataset_dir, tokenized_dir, exp, stage=1))
    assert (exp / "epoch-1").exists()
    # stage-switch resume: stage 2 (NAR) from the stage-1 checkpoint
    _run_main(trainer_main,
              _trainer_args(dataset_dir, tokenized_dir, exp, stage=2,
                            epochs=2, start_epoch=2))
    assert (exp / "epoch-2").exists()
    return exp


def test_offline_tokenizer(tokenized_dir):
    pass  # assertions live in the fixture


def test_train_stages_and_resume(trained_dir):
    pass  # assertions live in the fixture


def test_infer_cli(dataset_dir, tokenized_dir, trained_dir):
    from valle_tpu.bin.infer import main as infer_main

    out_dir = dataset_dir / "demos"
    wav_prompt = next((dataset_dir / "wavs").glob("*.wav"))
    argv = [
        "infer",
        "--checkpoint", str(trained_dir / "epoch-2"),
        "--text-tokens", str(tokenized_dir / "unique_text_tokens.k2symbols"),
        "--text-extractor", "char",
        "--text-prompts", "hello world",
        "--audio-prompts", str(wav_prompt),
        "--text", "testing speech",
        "--top-k", "5",
        "--max-gen-len", "24",
        "--decode-mode", "unroll",
        "--output-dir", str(out_dir),
    ]
    _run_main(infer_main, argv)
    outs = list(out_dir.glob("*.wav"))
    assert outs, "no wav produced"
    wav, sr = native.read_wav(outs[0])
    assert sr == 24_000
    assert wav.shape[0] > 0


def test_train_ar_packed(dataset_dir, tokenized_dir):
    """--ar-pack: sequence-packed AR training through the trainer CLI."""
    from valle_tpu.bin.trainer import main as trainer_main

    exp = dataset_dir / "exp_packed"
    _run_main(trainer_main, _trainer_args(
        dataset_dir, tokenized_dir, exp, stage=1,
        extra=("--ar-pack", "true", "--pack-max-frames", "128",
               "--pack-max-text", "32", "--pack-rows", "2")))
    assert (exp / "epoch-1").exists()


def test_train_nar_packed(dataset_dir, tokenized_dir):
    """--nar-pack: sequence-packed NAR training through the trainer CLI."""
    from valle_tpu.bin.trainer import main as trainer_main

    exp = dataset_dir / "exp_nar_packed"
    _run_main(trainer_main, _trainer_args(
        dataset_dir, tokenized_dir, exp, stage=2,
        extra=("--nar-pack", "true", "--pack-max-frames", "128",
               "--pack-max-text", "32", "--pack-rows", "2")))
    assert (exp / "epoch-1").exists()


def test_manifest_statistics_cli(tokenized_dir, capsys):
    from valle_tpu.bin.display_manifest_statistics import main as stats_main

    _run_main(stats_main, [
        "stats", "--manifest-dir", str(tokenized_dir),
        "--partitions", "train"])
    out = capsys.readouterr().out
    assert "Cuts count: 8" in out


def test_mel_transformer_pipeline(dataset_dir):
    """Fbank tokenization + Transformer mel model training via the CLIs."""
    from valle_tpu.bin.tokenizer import main as tok_main
    from valle_tpu.bin.trainer import main as trainer_main

    out = dataset_dir / "tokenized_fbank"
    _run_main(tok_main, [
        "tokenizer", "--src-dir", str(dataset_dir / "manifests"),
        "--output-dir", str(out), "--text-extractor", "char",
        "--audio-extractor", "Fbank", "--batch-duration", "2.0"])
    cuts = CutSet.from_file(out / "cuts_train.jsonl.gz")
    feats = cuts[0].load_features()
    assert feats.shape[1] == 100  # mel bins
    assert feats.dtype.kind == "f"

    exp = dataset_dir / "exp_mel"
    _run_main(trainer_main, [
        "trainer",
        "--manifest-dir", str(out),
        "--text-tokens", str(out / "unique_text_tokens.k2symbols"),
        "--exp-dir", str(exp),
        "--model-name", "Transformer",
        "--on-the-fly-feats", "true", "--enable-spec-aug", "true",
        "--decoder-dim", "32", "--nhead", "2", "--num-decoder-layers", "2",
        "--num-epochs", "1", "--max-duration", "6", "--num-buckets", "2",
        "--filter-min-duration", "0.1", "--filter-max-duration", "5.0",
        "--base-lr", "0.05", "--warmup-steps", "10",
        "--save-every-n", "100", "--valid-interval", "100",
        "--log-interval", "2", "--num-workers", "0",
        "--max-steps-per-epoch", "3",
        "--tensorboard", "false", "--oom-check", "false"])
    assert (exp / "epoch-1").exists()


def test_preemption_checkpoint(dataset_dir, tokenized_dir, tmp_path):
    """SIGTERM-style preemption: flag set mid-training -> a 'preempted'
    checkpoint (with sampler state) is written and the trainer exits 0;
    training can resume from it."""
    import signal

    import valle_tpu.bin.trainer as trainer_mod

    exp = tmp_path / "exp_preempt"
    argv = _trainer_args(dataset_dir, tokenized_dir, exp, stage=1)

    orig_install = trainer_mod.install_preemption_handler

    def install_and_fire():
        restore = orig_install()
        # deterministic stand-in for an async SIGTERM: the flag is set the
        # way the real handler sets it, before the first step completes
        trainer_mod._on_preempt_signal(signal.SIGTERM, None)
        return restore

    trainer_mod.install_preemption_handler = install_and_fire
    try:
        with pytest.raises(SystemExit) as exc:
            _run_main(trainer_mod.main, argv)
        assert exc.value.code == 0
    finally:
        trainer_mod.install_preemption_handler = orig_install

    assert (exp / "preempted").exists()
    # the checkpoint must load (params + sampler state for mid-epoch resume)
    from valle_tpu.utils import checkpoint as ckpt_lib

    loaded = ckpt_lib.load_checkpoint(str(exp / "preempted"))
    assert loaded is not None


def test_preemption_handler_is_scoped():
    """install_preemption_handler returns a restorer, and run() uses it:
    a host that embeds the trainer (this pytest process, a notebook, a
    supervisor) must not keep swallowing external SIGTERM after training
    returns — observed live: `timeout N pytest` could not stop the suite
    because an earlier in-process trainer run left the handler installed."""
    import signal

    import valle_tpu.bin.trainer as trainer_mod

    before_term = signal.getsignal(signal.SIGTERM)
    before_usr1 = signal.getsignal(signal.SIGUSR1)
    restore = trainer_mod.install_preemption_handler()
    try:
        assert signal.getsignal(signal.SIGTERM) \
            is trainer_mod._on_preempt_signal
        assert signal.getsignal(signal.SIGUSR1) \
            is trainer_mod._on_preempt_signal
    finally:
        restore()
    assert signal.getsignal(signal.SIGTERM) is before_term
    assert signal.getsignal(signal.SIGUSR1) is before_usr1

    # restore() is conservative: if someone re-bound the signal after
    # install, it leaves the newer handler alone
    restore2 = trainer_mod.install_preemption_handler()
    marker = signal.signal(signal.SIGUSR1, signal.SIG_IGN)
    assert marker is trainer_mod._on_preempt_signal
    restore2()
    assert signal.getsignal(signal.SIGUSR1) is signal.SIG_IGN
    assert signal.getsignal(signal.SIGTERM) is before_term
    signal.signal(signal.SIGUSR1, before_usr1)
