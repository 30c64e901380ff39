"""Reverse interop: export our pytree as a reference-named torch
state_dict (``export_torch_state_dict``) so TPU-trained models run under
the reference's own tooling (``/root/reference/valle/bin/infer.py:126-148``
rebuilds a model from checkpoint hyperparameters + ``load_state_dict``).

Validation is a full round trip against the ACTUAL reference model: the
exported key set must equal ``Model.state_dict()``'s exactly (strict
load), and import(export(params)) must be bitwise identity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import build_pair  # noqa: E402

from valle_tpu.utils.checkpoint import (  # noqa: E402
    export_torch_state_dict,
    import_torch_state_dict,
)


def _assert_round_trip(ref, cfg, params, state):
    sd = export_torch_state_dict(params, cfg, state)
    ref_sd = ref.state_dict()
    assert set(sd) == set(ref_sd), (
        set(sd) ^ set(ref_sd))
    for k, v in sd.items():
        rv = ref_sd[k].detach().cpu().numpy()
        assert v.shape == rv.shape, (k, v.shape, rv.shape)
        np.testing.assert_array_equal(v, rv, err_msg=k)
    # strict load into the live reference module must succeed
    ref.load_state_dict({k: torch.from_numpy(np.array(v))
                         for k, v in sd.items()}, strict=True)
    # import(export(...)) is bitwise identity on every leaf
    params2, state2 = import_torch_state_dict(sd, cfg)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("model_name", ["valle", "vallf"])
def test_export_round_trip(model_name):
    ref, cfg, params, state = build_pair(model_name=model_name)
    _assert_round_trip(ref, cfg, params, state)


def test_export_round_trip_no_share_embedding():
    ref, cfg, params, state = build_pair(share_embedding=False)
    _assert_round_trip(ref, cfg, params, state)


def test_export_round_trip_add_prenet():
    ref, cfg, params, state = build_pair(add_prenet=True)
    _assert_round_trip(ref, cfg, params, state)


def test_export_cli_writes_reference_checkpoint(tmp_path):
    """bin/export_torch.py: orbax checkpoint -> reference-loadable .pt
    (hyperparameters + model state_dict, the infer.py:126-136 contract)."""
    import jax

    from valle_tpu.bin.export_torch import main as export_main
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.utils.checkpoint import save_checkpoint

    cfg = ValleConfig(d_model=32, nhead=2, num_layers=2, prefix_mode=1,
                      num_quantizers=8, max_len=512)
    params, state = init_valle(jax.random.PRNGKey(0), cfg)
    from dataclasses import asdict

    ckpt_dir = save_checkpoint(
        str(tmp_path), "epoch-1", params=params, state=state,
        run_params={"model_config": asdict(cfg)})
    out = tmp_path / "export.pt"
    rc = export_main([ckpt_dir, str(out)])
    assert rc == 0 and out.exists()

    blob = torch.load(str(out), map_location="cpu", weights_only=False)
    assert blob["decoder_dim"] == 32 and blob["num_decoder_layers"] == 2
    # the saved state dict round-trips through the importer bitwise
    params2, _ = import_torch_state_dict(blob["model"], cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
