"""Non-finite diagnostics: the --inf-check capability (reference registers
per-module inf/nan hooks, valle/bin/trainer.py:177-180; ours reports
grad_norm every step and, on failure, names the first NaN op + every
non-finite leaf)."""

import jax
import jax.numpy as jnp
import numpy as np

from valle_tpu.utils.inf_check import (
    diagnose_nonfinite,
    first_nan_location,
    nonfinite_leaf_paths,
)


def test_nonfinite_leaf_paths():
    tree = {
        "a": {"w": jnp.ones((3,)), "b": jnp.array([1.0, np.inf])},
        "c": jnp.array([np.nan]),
        "ok": jnp.zeros((2, 2)),
    }
    bad = nonfinite_leaf_paths(tree)
    assert any("'a'" in p and "'b'" in p for p in bad)
    assert any("'c'" in p for p in bad)
    assert len(bad) == 2
    assert nonfinite_leaf_paths({"x": jnp.ones(4)}) == []


def test_first_nan_location_names_the_op():
    def f(x):
        y = jnp.log(x)          # fine for x > 0
        return jnp.sum(0.0 * y + jnp.sqrt(x - 10.0))  # sqrt(neg) -> NaN

    msg = first_nan_location(f, jnp.array([1.0, 2.0]))
    assert msg is not None and "nan" in msg.lower()
    assert "sqrt" in msg  # the primitive is named

    msg_ok = first_nan_location(lambda x: jnp.sum(x * 2), jnp.ones(3))
    assert msg_ok is None


def test_diagnose_nonfinite_on_model_step():
    """Poisoned params produce a report naming param + grad leaves."""
    from valle_tpu.models import ValleConfig, init_valle, valle_forward

    cfg = ValleConfig(d_model=16, nhead=2, num_layers=1, num_quantizers=2,
                      max_len=128, prefix_mode=0)
    params, state = init_valle(jax.random.PRNGKey(0), cfg)
    params["ar"]["predict"]["w"] = params["ar"]["predict"]["w"].at[0, 0].set(
        jnp.nan)
    batch = {
        "text": jnp.zeros((1, 4), jnp.int32),
        "text_lens": jnp.array([4], jnp.int32),
        "audio": jnp.zeros((1, 8, 2), jnp.int32),
        "audio_lens": jnp.array([8], jnp.int32),
    }

    def loss_fn(p, b):
        loss, _, _ = valle_forward(p, cfg, b, train_stage=1,
                                   rng=jax.random.PRNGKey(1),
                                   deterministic=True, state=state)
        return loss

    report = diagnose_nonfinite(loss_fn, params, batch)
    assert "PARAM" in report and "predict" in report
    assert "GRAD" in report or "NaN op" in report


def test_train_step_reports_grad_norm():
    from valle_tpu.models import ValleConfig
    from valle_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = ValleConfig(d_model=16, nhead=2, num_layers=1, num_quantizers=2,
                      max_len=128, prefix_mode=0)
    from valle_tpu.models import init_valle

    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, base_lr=0.05, train_stage=0)
    del params
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = jax.jit(make_train_step(cfg, opt, lr_fn, train_stage=0))
    batch = {
        "text": jnp.zeros((2, 4), jnp.int32),
        "text_lens": jnp.array([4, 3], jnp.int32),
        "audio": jnp.zeros((2, 8, 2), jnp.int32),
        "audio_lens": jnp.array([8, 6], jnp.int32),
    }
    _, metrics = step(state, batch, jnp.int32(0), jax.random.PRNGKey(2))
    gn = float(metrics["grad_norm"])
    assert np.isfinite(gn) and gn > 0
