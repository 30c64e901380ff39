"""Model factory and CLI arguments.

Capability parity with reference ``valle/models/__init__.py``:
``add_model_arguments`` (:18) exposes the same flag set; ``get_model``
(:98) dispatches VALL-E / VALL-F / Transformer(mel).
"""

from __future__ import annotations

import argparse
from dataclasses import asdict

import jax

from ..utils.common import str2bool
from .macros import NUM_MEL_BINS
from .valle import (  # noqa: F401
    ValleConfig,
    init_valle,
    nar_predict_weights,
    pad_y_eos,
    stage_params_mask,
    top10_accuracy,
    valle_forward,
)
from .inference import (  # noqa: F401
    valle_ar_decode,
    valle_continual,
    valle_inference,
    valle_nar_decode,
)


def add_model_arguments(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--model-name", type=str, default="VALL-E",
                        help="VALL-E | VALL-F | Transformer.")
    parser.add_argument("--decoder-dim", type=int, default=1024,
                        help="Embedding dimension in the decoder model.")
    parser.add_argument("--nhead", type=int, default=16,
                        help="Number of attention heads.")
    parser.add_argument("--num-decoder-layers", type=int, default=12,
                        help="Number of decoder layers.")
    parser.add_argument("--scale-factor", type=float, default=1.0,
                        help="Model scale factor which will be assigned "
                             "different meanings in different models.")
    parser.add_argument("--norm-first", type=str2bool, default=True,
                        help="Pre or Post Normalization.")
    parser.add_argument("--add-prenet", type=str2bool, default=False,
                        help="Whether to add PreNet after Inputs.")
    parser.add_argument("--prefix-mode", type=int, default=0,
                        help="The mode for how to prefix VALL-E NAR Decoder, "
                             "0: no prefix, 1: 0 to random, 2: random to "
                             "random, 4: chunk of pre or post utterance.")
    parser.add_argument("--share-embedding", type=str2bool, default=True,
                        help="Share the parameters of the output projection "
                             "layer with the parameters of the acoustic "
                             "embedding.")
    parser.add_argument("--prepend-bos", type=str2bool, default=False,
                        help="Whether to prepend <BOS> to the acoustic "
                             "tokens -> AR Decoder inputs.")
    parser.add_argument("--num-quantizers", type=int, default=8,
                        help="Number of Audio/Semantic quantization layers.")
    parser.add_argument("--scaling-xformers", type=str2bool, default=False,
                        help="Apply the scaling-transformer variant "
                             "(Transformer model only).")
    parser.add_argument("--attn-score-bf16", type=str, default="auto",
                        help="bf16 score materialization in training "
                             "attention: auto | on | off. Only engages "
                             "for bf16 compute (fp32 recipes are exact "
                             "regardless). 'auto' = on: measured +36%% "
                             "AR / +21%% NAR step throughput at loss "
                             "parity (BASELINE.md round-3).")
    parser.add_argument("--attn-impl", type=str, default="auto",
                        choices=("auto", "einsum", "flash"),
                        help="Training-attention implementation: einsum "
                             "(XLA; S x S scores/probs materialize to HBM) "
                             "or flash (fused fwd+bwd Pallas kernels with "
                             "in-kernel dropout; ops/flash_mha.py). 'auto' "
                             "= flash on TPU (measured +25%% AR / +8%% NAR "
                             "step vs the einsum champions, BASELINE.md "
                             "round-5), einsum elsewhere. flash changes "
                             "the dropout mask draw only (unbiased either "
                             "way); deterministic/fp32 forwards are "
                             "parity-exact. VALL-F always uses einsum.")
    parser.add_argument("--remat", type=str, default="auto",
                        help="Training rematerialization policy: auto | "
                             "full | dots | none | scores ('scores' saves "
                             "all residuals except the S x S attention "
                             "score/prob matrices — near-'none' speed in "
                             "flash-attention's memory footprint). "
                             "'auto' picks the measured "
                             "per-stage optimum (bench_train_stage.py, "
                             "BASELINE.md): 'none' for the NAR stage "
                             "(--train-stage 2, +19%% step throughput at "
                             "max-duration-40 shapes) and 'full' otherwise "
                             "(AR at max-duration 80 OOMs without full "
                             "remat). If a larger NAR batch OOMs, fall "
                             "back to --remat full.")


def resolve_score_bf16(mode: str) -> bool:
    """Resolve ``--attn-score-bf16``: "auto" enables bf16 score
    materialization for every training stage — the S x S f32 score
    traffic dominates BOTH steps (in-process A/Bs, BASELINE.md round-3:
    AR +36% step throughput, 241.5 -> 177.1 ms; NAR +21% on top of
    remat="none"; loss parity within 0.01% both). Inert at fp32
    compute, so the strict-parity fp32 recipes are unaffected."""
    if mode == "auto":
        return True
    if mode in ("on", "1", "true"):
        return True
    if mode in ("off", "0", "false"):
        return False
    raise ValueError(f"unknown attn-score-bf16 mode {mode!r}")


def resolve_attn_impl(mode: str, model_name: str = "valle") -> str:
    """Resolve ``--attn-impl``. "auto" maps to "flash" on TPU — the
    round-5 step-level A/B at the recipe shapes measured the fused
    fwd+bwd kernels at +25% AR (B16, vs the round-4 champion
    remat=full einsum; 266.4 vs 333.5 ms/step) and +8% NAR (B8, vs
    einsum with bf16 scores; 295.1 vs 320.0 ms/step) in-session
    (BASELINE.md round-5, benchmarks/bench_train_stage.py impl=) —
    and to "einsum" on any other backend (the kernels would run in
    interpret mode). VALL-F's decoder stack has cross-attention, no
    flash path: always einsum."""
    if model_name == "vallf":
        return "einsum"
    if mode == "auto":
        import jax

        return "flash" if jax.default_backend() == "tpu" else "einsum"
    if mode in ("einsum", "flash"):
        return mode
    raise ValueError(f"unknown attn-impl {mode!r}")


def resolve_remat(remat: str, train_stage: int) -> str:
    """Resolve the ``--remat`` policy, mapping "auto" to the measured
    per-stage optimum (``benchmarks/bench_train_stage.py``, BASELINE.md):

    - NAR stage (``train_stage == 2``): "none" — saving residuals wins
      +19% step throughput (114.5 vs 136.2 ms/step) and fits at the
      reference's max-duration-40 budget;
    - AR stage / both-stages: "full" — the AR step at max-duration 80
      OOMs without full remat on a 16 GB chip; "dots" is only
      throughput-parity and the selective "scores" policy measured 7%
      SLOWER than full at B16 (and compile-OOMs at B32), so "full"
      stays the pick (2026-08-18 A/B, BASELINE.md).
    """
    if remat == "auto":
        return "none" if train_stage == 2 else "full"
    if remat not in ("full", "dots", "none", "scores"):
        raise ValueError(f"unknown remat policy {remat!r}")
    return remat


class ValleModel:
    """Thin OO wrapper bundling a config with the functional API.

    Keeps reference-like ergonomics (``model.forward`` / ``model.inference``
    / ``model.continual``) over the pure functions.
    """

    def __init__(self, cfg: ValleConfig):
        self.cfg = cfg

    def init(self, rng: jax.Array):
        return init_valle(rng, self.cfg)

    def forward(self, params, batch, **kw):
        return valle_forward(params, self.cfg, batch, **kw)

    __call__ = forward

    def inference(self, params, text, text_lens, prompt_codes, prompt_lens,
                  enroll_x_lens=None, **kw):
        return valle_inference(
            params, self.cfg, text, text_lens, prompt_codes, prompt_lens,
            enroll_x_lens, **kw)

    def continual(self, params, text, text_lens, y, y_lens, **kw):
        return valle_continual(params, self.cfg, text, text_lens, y, y_lens,
                               **kw)

    def stage_params_mask(self, params, stage: int):
        return stage_params_mask(params, stage)

    def config_dict(self):
        return asdict(self.cfg)


def get_model(params) -> "ValleModel":
    """Build a model from an (argparse-derived) params bag.

    Mirrors reference ``valle/models/__init__.py:98-136``.
    """
    name = params.model_name.lower()
    if name == "transformer":
        from .transformer import TransformerTtsConfig, TransformerTtsModel

        cfg = TransformerTtsConfig(
            d_model=params.decoder_dim,
            nhead=params.nhead,
            num_layers=params.num_decoder_layers,
            norm_first=params.norm_first,
            add_prenet=params.add_prenet,
            scaling_xformers=getattr(params, "scaling_xformers", False),
            num_mel_bins=NUM_MEL_BINS,
        )
        return TransformerTtsModel(cfg)

    if name not in ("vall-e", "valle", "vall-f", "vallf"):
        raise ValueError(f"unknown model name {params.model_name!r}")
    model_name = "vallf" if "f" in name.replace("vall", "") else "valle"
    cfg = ValleConfig(
        remat=resolve_remat(getattr(params, "remat", "auto"),
                            getattr(params, "train_stage", 0)),
        attn_score_bf16=resolve_score_bf16(
            getattr(params, "attn_score_bf16", "auto")),
        attn_impl=resolve_attn_impl(
            getattr(params, "attn_impl", "auto"), model_name),
        model_name=model_name,
        d_model=params.decoder_dim,
        nhead=params.nhead,
        num_layers=params.num_decoder_layers,
        norm_first=params.norm_first,
        add_prenet=params.add_prenet,
        prefix_mode=params.prefix_mode,
        share_embedding=params.share_embedding,
        nar_scale_factor=params.scale_factor,
        prepend_bos=params.prepend_bos,
        num_quantizers=params.num_quantizers,
    )
    return ValleModel(cfg)
