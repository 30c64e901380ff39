"""A reference-format .pt checkpoint loads and synthesizes through our
infer CLI (the migration path for users of the PyTorch reference)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_infer_cli_with_torch_checkpoint(tmp_path):
    from test_torch_parity import build_pair

    from valle_tpu import native
    from valle_tpu.utils import SymbolTable

    ref, cfg, _, _ = build_pair(model_name="valle", prefix_mode=1)

    # symbol table covering the char backend's outputs
    table = SymbolTable(eps=None)
    table.add("<pad>", 0)
    table.add("<bos>", 1)
    table.add("<eos>", 2)
    for i, s in enumerate(sorted(set("abcdefghijklmnopqrstuvwxyz_!.?"))):
        table.add(s, 3 + i)
    tokens_path = tmp_path / "unique_text_tokens.k2symbols"
    table.to_file(tokens_path)

    ckpt_path = tmp_path / "epoch-99.pt"
    torch.save({
        "model": ref.state_dict(),
        "model_name": "VALL-E",
        "decoder_dim": 32, "nhead": 2, "num_decoder_layers": 2,
        "norm_first": True, "add_prenet": False, "prefix_mode": 1,
        "share_embedding": True, "scale_factor": 1.0, "prepend_bos": False,
        "num_quantizers": 8,
        "text_tokens": str(tokens_path),
    }, ckpt_path)

    # a tiny prompt wav
    sr = 24_000
    wav = (0.2 * np.sin(2 * np.pi * 300 * np.arange(sr // 4) / sr)
           ).astype(np.float32)
    prompt_path = tmp_path / "prompt.wav"
    native.write_wav(prompt_path, wav, sr)

    from valle_tpu.bin.infer import main as infer_main

    out_dir = tmp_path / "demos"
    argv = [
        "infer", "--checkpoint", str(ckpt_path),
        "--text-tokens", str(tokens_path),
        "--text-extractor", "char",
        "--text-prompts", "hello", "--audio-prompts", str(prompt_path),
        "--text", "testing", "--top-k", "3", "--max-gen-len", "16",
        "--output-dir", str(out_dir),
    ]
    old = sys.argv
    sys.argv = argv
    try:
        infer_main()
    finally:
        sys.argv = old
    outs = list(out_dir.glob("*.wav"))
    assert outs
    w, sr2 = native.read_wav(outs[0])
    assert sr2 == 24_000 and w.shape[0] > 0


def test_infer_cli_tsv_demo_mode(tmp_path):
    """The TSV batch-demo mode (reference infer.py:180-221)."""
    from test_torch_parity import build_pair

    from valle_tpu import native
    from valle_tpu.bin.infer import main as infer_main
    from valle_tpu.utils import SymbolTable

    ref, cfg, _, _ = build_pair(model_name="valle", prefix_mode=1)
    table = SymbolTable(eps=None)
    for i, s in enumerate(["<pad>", "<bos>", "<eos>"] + sorted(
            set("abcdefghijklmnopqrstuvwxyz_!.?"))):
        table.add(s, i)
    tokens_path = tmp_path / "tokens.k2symbols"
    table.to_file(tokens_path)
    ckpt_path = tmp_path / "ckpt.pt"
    torch.save({"model": ref.state_dict(), "model_name": "VALL-E",
                "decoder_dim": 32, "nhead": 2, "num_decoder_layers": 2,
                "prefix_mode": 1, "num_quantizers": 8,
                "text_tokens": str(tokens_path)}, ckpt_path)

    sr = 24_000
    wav = (0.2 * np.sin(2 * np.pi * 250 * np.arange(sr // 4) / sr)
           ).astype(np.float32)
    prompt_path = tmp_path / "p.wav"
    native.write_wav(prompt_path, wav, sr)

    out_wav = tmp_path / "out" / "demo0.wav"
    tsv = tmp_path / "demo.tsv"
    tsv.write_text(f"hello there\t{prompt_path}\ttesting now\t{out_wav}\n")

    argv = ["infer", "--checkpoint", str(ckpt_path),
            "--text-tokens", str(tokens_path), "--text-extractor", "char",
            "--text", str(tsv), "--top-k", "3", "--max-gen-len", "16",
            "--output-dir", str(tmp_path / "unused")]
    old = sys.argv
    sys.argv = argv
    try:
        infer_main()
    finally:
        sys.argv = old
    assert out_wav.exists()
    w, sr2 = native.read_wav(out_wav)
    assert sr2 == 24_000 and w.shape[0] > 0
