#!/usr/bin/env python3
"""Zero-shot TTS inference CLI.

Capability parity with reference ``valle/bin/infer.py``: ``--text-prompts``
/ ``--audio-prompts`` ("|"-separated pairs), ``--text`` targets, model
rebuilt from the checkpoint's stored hyperparameters (:126-136), top-k /
temperature sampling, ``--continual`` mode, TSV batch-demo mode, 24 kHz wav
output. Accepts both our orbax checkpoints and reference ``.pt``
checkpoints (imported through the torch converter).

Example:
  python3 -m valle_tpu.bin.infer --output-dir demos/ \
      --model-name valle --norm-first true --add-prenet false \
      --share-embedding true --decoder-dim 1024 --nhead 16 \
      --num-decoder-layers 12 --prefix-mode 1 \
      --text-prompts "KNOT one point one five miles per hour." \
      --audio-prompts ./prompts/8463_294825_000043_000000.wav \
      --text "To get up and running quickly just follow the steps below." \
      --checkpoint exp/valle/best-valid-loss
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from ..utils import setup_logger, str2bool


def get_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--text-prompts", type=str, default="",
                        help="Text prompts separated by |.")
    parser.add_argument("--audio-prompts", type=str, default="",
                        help="Audio prompt wavs separated by |.")
    parser.add_argument("--text", type=str,
                        default="To get up and running quickly just follow "
                                "the steps below.",
                        help="Text to synthesize, | separated.")
    parser.add_argument("--language", type=str, default="en-us")
    parser.add_argument("--text-extractor", type=str, default="espeak",
                        help="espeak | pypinyin | pypinyin_initials_finals "
                             "| char")
    parser.add_argument("--checkpoint", type=str,
                        default="exp/vallf_nano_full/checkpoint-100000")
    parser.add_argument("--text-tokens", type=str, default=None,
                        help="Symbol table path; defaults to the path "
                             "stored in the checkpoint, then to "
                             "data/tokenized/unique_text_tokens.k2symbols")
    parser.add_argument("--encodec-weights", type=str, default=None,
                        help="Path to pretrained EnCodec 24 kHz torch "
                             "weights (or set VALLE_TPU_ENCODEC_WEIGHTS).")
    parser.add_argument("--top-k", type=int, default=-100)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--continual", type=str2bool, default=False)
    parser.add_argument("--output-dir", type=str, default="infer/demos")
    parser.add_argument("--max-gen-len", type=int, default=1024)
    parser.add_argument("--decode-mode", type=str, default="exact",
                        help="exact | unroll (token-exact, faster) | fused "
                             "(token-exact, weight-streaming Pallas dense "
                             "path) | int8 | fused_int8 (fastest at long "
                             "caches; int8 modes need batch %% 8 == 0, "
                             "fall back at the CLI's batch 1) | auto "
                             "(fused/int8 by request shape).")
    parser.add_argument("--seed", type=int, default=0)
    from ..models import add_model_arguments

    add_model_arguments(parser)
    return parser


def load_model(checkpoint: str, args=None):
    """Rebuild model + params from a checkpoint path.

    Supports our orbax checkpoint dirs and reference .pt files.
    Hyperparameters stored in the checkpoint take precedence; anything
    the checkpoint does not record falls back to the CLI model flags
    (``args``) so bare state-dict .pt files load with the user's
    --decoder-dim/--prefix-mode/... instead of silent hardcoded defaults.
    Returns (model, params, model_state, text_tokens_path).
    """
    from ..models import ValleConfig, ValleModel
    from ..utils import checkpoint as ckpt_lib

    def fb(ckpt, key, hard):
        if key in ckpt:
            return ckpt[key]
        if args is not None and hasattr(args, key):
            return getattr(args, key)
        return hard

    p = Path(checkpoint)
    if p.is_file() and p.suffix in (".pt", ".pth", ".bin"):
        name = None
        import torch

        raw = torch.load(str(p), map_location="cpu", weights_only=False)
        ckpt = raw if isinstance(raw, dict) else {}
        name = str(fb(ckpt, "model_name", "VALL-E")).lower()
        cfg = ValleConfig(
            model_name="vallf" if name in ("vall-f", "vallf") else "valle",
            d_model=fb(ckpt, "decoder_dim", 1024),
            nhead=fb(ckpt, "nhead", 16),
            num_layers=fb(ckpt, "num_decoder_layers", 12),
            norm_first=fb(ckpt, "norm_first", True),
            add_prenet=fb(ckpt, "add_prenet", False),
            prefix_mode=fb(ckpt, "prefix_mode", 0),
            share_embedding=fb(ckpt, "share_embedding", True),
            nar_scale_factor=fb(ckpt, "scale_factor", 1.0),
            prepend_bos=fb(ckpt, "prepend_bos", False),
            num_quantizers=fb(ckpt, "num_quantizers", 8),
        )
        params, state, ckpt = ckpt_lib.load_torch_checkpoint(str(p),
                                                             cfg=cfg)
        return ValleModel(cfg), params, state, ckpt.get("text_tokens")
    items, meta = ckpt_lib.load_checkpoint(str(p))
    run_params = (meta or {}).get("run_params") or {}
    cfg_dict = run_params.get("model_config") or {}
    if not cfg_dict and args is not None:
        from ..models import get_model
        from ..utils import AttributeDict

        model = get_model(AttributeDict(vars(args)))
        return (model, items["params"], items.get("state", {}),
                run_params.get("text_tokens"))
    cfg = ValleConfig(**cfg_dict)
    return (ValleModel(cfg), items["params"], items.get("state", {}),
            run_params.get("text_tokens"))


def main():
    args = get_parser().parse_args()
    setup_logger()
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ..data import AudioTokenizer, TextTokenizer, tokenize_audio
    from ..data.collation import get_text_token_collater
    from .. import native

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    text_tokenizer = TextTokenizer(language=args.language,
                                   backend=args.text_extractor)
    model, params, model_state, ckpt_tokens = load_model(args.checkpoint,
                                                         args)
    text_collater = get_text_token_collater(
        args.text_tokens or ckpt_tokens
        or "data/tokenized/unique_text_tokens.k2symbols")
    audio_tokenizer = AudioTokenizer(weights_path=args.encodec_weights)
    if not audio_tokenizer.pretrained:
        logging.warning(
            "EnCodec running with RANDOM weights (no --encodec-weights); "
            "decoded audio will not be intelligible")

    text_prompts = " ".join(args.text_prompts.split("|"))
    audio_prompts_list = []
    if args.audio_prompts:
        for n, audio_file in enumerate(args.audio_prompts.split("|")):
            codes = tokenize_audio(audio_tokenizer, audio_file)  # (1, F, Q)
            audio_prompts_list.append(codes)
        audio_prompts = np.concatenate(audio_prompts_list, axis=1)
    else:
        audio_prompts = np.zeros((1, 0, model.cfg.num_quantizers), np.int32)

    rng = jax.random.PRNGKey(args.seed)

    import os

    if os.path.isfile(args.text):  # TSV batch-demo mode (reference :180-221)
        from ..data.tokenizer import tokenize_text

        with open(args.text, encoding="utf-8") as f:
            for k, line in enumerate(f):
                fields = line.strip().split("\t")
                assert len(fields) == 4, line
                prompt_text, prompt_audio, text, audio_path = fields
                logging.info(f"synthesize text: {text}")
                full_tokens = tokenize_text(
                    text_tokenizer, f"{prompt_text} {text}".strip())
                text_ids, text_lens = text_collater([full_tokens])
                enroll_tokens = tokenize_text(
                    text_tokenizer, prompt_text.strip()) \
                    if prompt_text.strip() else []
                # +2 includes the boundary tokens; 2 is the identity under
                # trim_enrolled_text for an empty prompt
                enroll_x_lens = np.array([len(enroll_tokens) + 2], np.int32)
                prompt_codes = tokenize_audio(audio_tokenizer, prompt_audio)
                codes, out_lens = model.inference(
                    params, jnp.asarray(text_ids), jnp.asarray(text_lens),
                    jnp.asarray(prompt_codes),
                    jnp.asarray([prompt_codes.shape[1]], np.int32),
                    enroll_x_lens=jnp.asarray(enroll_x_lens),
                    top_k=args.top_k, temperature=args.temperature,
                    rng=jax.random.fold_in(rng, k),
                    max_gen_len=args.max_gen_len,
                    decode_mode=args.decode_mode, state=model_state)
                gl = int(out_lens[0])
                if gl == 0:
                    logging.warning(f"line {k}: empty generation; skipped")
                    continue
                wav = audio_tokenizer.decode(np.asarray(codes[:, :gl]))[0]
                Path(audio_path).parent.mkdir(parents=True, exist_ok=True)
                native.write_wav(audio_path, wav,
                                 audio_tokenizer.sample_rate)
                logging.info(f"saved {audio_path}")
        return

    for n, text in enumerate(args.text.split("|")):
        logging.info(f"synthesize text: {text}")
        # prompt text and target text are phonemized TOGETHER
        # (reference infer.py:225-231)
        from ..data.tokenizer import tokenize_text

        full_tokens = tokenize_text(
            text_tokenizer, f"{text_prompts} {text}".strip())
        text_ids, text_lens = text_collater([full_tokens])
        enroll_tokens = tokenize_text(text_tokenizer, text_prompts) \
            if text_prompts else []
        # 2 = identity under trim_enrolled_text for an empty prompt
        enroll_x_lens = np.array([len(enroll_tokens) + 2], np.int32)

        P = audio_prompts.shape[1]
        prompt_codes = (audio_prompts if P > 0 else
                        np.zeros((1, 1, model.cfg.num_quantizers), np.int32))
        prompt_lens = np.array([P], np.int32)

        if args.continual:
            # resynthesize quantizers 1..7 of the prompt itself
            codes, out_lens = model.continual(
                params, jnp.asarray(text_ids), jnp.asarray(text_lens),
                jnp.asarray(prompt_codes), jnp.asarray([P]),
                state=model_state)
        else:
            codes, out_lens = model.inference(
                params, jnp.asarray(text_ids), jnp.asarray(text_lens),
                jnp.asarray(prompt_codes), jnp.asarray(prompt_lens),
                enroll_x_lens=jnp.asarray(enroll_x_lens),
                top_k=args.top_k, temperature=args.temperature,
                rng=jax.random.fold_in(rng, n),
                max_gen_len=args.max_gen_len,
                decode_mode=args.decode_mode, state=model_state)
        gl = int(out_lens[0])
        if gl == 0:
            logging.warning(f"utterance {n}: empty generation")
            continue
        gen_codes = np.asarray(codes[0, :gl])  # (T, Q)
        wav = audio_tokenizer.decode(gen_codes[None])[0]
        out_path = out_dir / f"{n}.wav"
        native.write_wav(out_path, wav, audio_tokenizer.sample_rate)
        logging.info(f"saved {out_path} ({len(wav) / 24000:.2f} s, "
                     f"{gl} frames)")


if __name__ == "__main__":
    main()
