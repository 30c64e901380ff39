#!/usr/bin/env python3
"""Export an orbax checkpoint as a reference-compatible PyTorch ``.pt``.

The inverse of ``bin/infer.py --checkpoint ref.pt``: models trained with
our trainer can be handed to users of the reference stack — its
``bin/infer.py`` rebuilds the model from the checkpoint's hyperparameter
keys and ``load_state_dict``'s the ``"model"`` entry
(``/root/reference/valle/bin/infer.py:126-148``). The emitted key set
matches ``Model.state_dict()`` exactly (strict load), see
``utils/checkpoint.py:export_torch_state_dict``.

Usage:
  python -m valle_tpu.bin.export_torch <orbax_ckpt_dir> <out.pt>
"""

import sys
from pathlib import Path


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    ckpt_dir, out_path = argv

    import torch

    from ..models.valle import ValleConfig
    from ..utils import checkpoint as ckpt_lib
    from ..utils.checkpoint import export_torch_state_dict

    items, meta = ckpt_lib.load_checkpoint(str(Path(ckpt_dir)))
    run_params = (meta or {}).get("run_params") or {}
    cfg_dict = run_params.get("model_config") or {}
    if not cfg_dict:
        print("checkpoint has no embedded model_config; re-save it with "
              "the trainer or pass a config-bearing checkpoint",
              file=sys.stderr)
        return 1
    # drop our TPU-only schedule knobs; the reference config doesn't have them
    cfg = ValleConfig(**{k: v for k, v in cfg_dict.items()
                         if k in ValleConfig.__dataclass_fields__})

    sd = export_torch_state_dict(items["params"], cfg,
                                 state=items.get("state"))
    blob = {
        "model": {k: torch.from_numpy(v.copy()) if hasattr(v, "copy")
                  else torch.tensor(v) for k, v in sd.items()},
        # hyperparameter keys the reference's infer.py reads back
        "model_name": "VALL-F" if cfg.model_name == "vallf" else "VALL-E",
        "decoder_dim": cfg.d_model,
        "nhead": cfg.nhead,
        "num_decoder_layers": cfg.num_layers,
        "norm_first": cfg.norm_first,
        "add_prenet": cfg.add_prenet,
        "prefix_mode": cfg.prefix_mode,
        "share_embedding": cfg.share_embedding,
        "scale_factor": cfg.nar_scale_factor,
        "prepend_bos": cfg.prepend_bos,
        "num_quantizers": cfg.num_quantizers,
    }
    if run_params.get("text_tokens") is not None:
        blob["text_tokens"] = run_params["text_tokens"]
    torch.save(blob, out_path)
    print(f"wrote {out_path} ({len(sd)} tensors)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
