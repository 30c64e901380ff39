"""Step-trajectory parity of our optax ScaledAdam / Eve vs the reference
torch optimizers, plus Eden schedule value parity.

Identical parameters + identical analytic gradients each step must produce
identical parameter trajectories (the optimizers are deterministic).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_reference_optim  # noqa: E402

from valle_tpu.optim import eden_lr, eve, noam_lr, scaled_adam  # noqa: E402

STEPS = 35


def run_pair(shapes, *, clipping_scale=None, clipping_update_period=10,
             lr=0.03, steps=STEPS, make_opt=None, make_ref=None):
    """Run both optimizers on grad = (p - target) and return trajectories."""
    ref_optim = load_reference_optim()
    torch.manual_seed(0)
    t_params = [torch.nn.Parameter(torch.randn(*s)) for s in shapes]
    # target far from init: gradients never cross zero, so trajectories are
    # smooth and fp32 round-off cannot flip the sign-like normalized update
    targets = [p.detach() - 5.0 for p in t_params]

    # .copy(): jax CPU arrays can alias numpy/torch memory (zero-copy),
    # and the reference optimizer updates its params in place
    j_params = [jnp.asarray(p.detach().numpy().copy()) for p in t_params]
    j_targets = [jnp.asarray(t.numpy().copy()) for t in targets]

    if make_ref is None:
        ref_opt = ref_optim.ScaledAdam(
            t_params, lr=lr, clipping_scale=clipping_scale,
            clipping_update_period=clipping_update_period,
            parameters_names=[[f"p{i}" for i in range(len(t_params))]],
            show_dominant_parameters=False)
    else:
        ref_opt = make_ref(t_params)

    if make_opt is None:
        opt = scaled_adam(learning_rate=lr, clipping_scale=clipping_scale,
                          clipping_update_period=clipping_update_period,
                          stacked_fn=lambda path: False)
    else:
        opt = make_opt()
    j_state = opt.init(j_params)

    @jax.jit
    def step_fn(params, state, tgts, scale):
        grads = [(p - t) * scale for p, t in zip(params, tgts)]
        updates, state = opt.update(grads, state, params)
        params = [p + u for p, u in zip(params, updates)]
        return params, state

    for i in range(steps):
        # spike at step 25 exercises the clip<1 path after the threshold
        # has been estimated (clipping_update_period=10)
        scale = 3.0 if i == 25 else 1.0
        for p, t in zip(t_params, targets):
            p.grad = (p.detach() - t) * scale
        ref_opt.step()
        j_params, j_state = step_fn(j_params, j_state, j_targets,
                                    jnp.float32(scale))
    return t_params, j_params


@pytest.mark.parametrize("clipping_scale", [None, 2.0])
def test_scaled_adam_parity(clipping_scale):
    shapes = [(10, 8), (16,), (1,)]  # matrix, vector, scalar paths
    t_params, j_params = run_pair(shapes, clipping_scale=clipping_scale)
    for tp, jp in zip(t_params, j_params):
        np.testing.assert_allclose(
            np.asarray(jp), tp.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_scaled_adam_stacked_matches_separate():
    """A leading-axis-stacked leaf must behave exactly like separate leaves
    (this is what our scan-over-layers params rely on)."""
    lr = 0.03
    n, shape = 3, (6, 5)
    key = jax.random.PRNGKey(0)
    ps = jax.random.normal(key, (n, *shape))
    ts = ps - 5.0

    opt_sep = scaled_adam(learning_rate=lr, stacked_fn=lambda p: False)
    sep_params = [ps[i] for i in range(n)]
    sep_state = opt_sep.init(sep_params)

    opt_stk = scaled_adam(learning_rate=lr, stacked_fn=lambda p: True)
    stk_params = ps
    stk_state = opt_stk.init(stk_params)

    @jax.jit
    def sep_step(params, state):
        grads = [p - ts[i] for i, p in enumerate(params)]
        u, state = opt_sep.update(grads, state, params)
        return [p + du for p, du in zip(params, u)], state

    @jax.jit
    def stk_step(params, state):
        grads = params - ts
        u, state = opt_stk.update(grads, state, params)
        return params + u, state

    for _ in range(20):
        sep_params, sep_state = sep_step(sep_params, sep_state)
        stk_params, stk_state = stk_step(stk_params, stk_state)

    np.testing.assert_allclose(np.asarray(stk_params),
                               np.stack([np.asarray(p) for p in sep_params]),
                               rtol=1e-5, atol=1e-7)


def test_scaled_adam_bf16_state_tracks_f32_trajectory():
    """state_dtype=bfloat16 (storage-only quantization of delta +
    exp_avg_sq; f32 arithmetic) is CHARACTERIZED, not parity-matched:
    over the same 35-step run as the reference-parity test, the final
    params must track the f32-state trajectory to bf16-commensurate
    tolerance, and the distance to the optimization TARGET must not
    degrade (the quantization must not change where the optimizer goes,
    only dither the path)."""
    shapes = [(10, 8), (16,), (1,)]
    lr = 0.03
    mk32 = lambda: scaled_adam(learning_rate=lr,
                               stacked_fn=lambda path: False)
    mk16 = lambda: scaled_adam(learning_rate=lr,
                               stacked_fn=lambda path: False,
                               state_dtype=jnp.bfloat16)
    _, p32 = run_pair(shapes, make_opt=mk32)
    _, p16 = run_pair(shapes, make_opt=mk16)
    for a, b in zip(p32, p16):
        a, b = np.asarray(a), np.asarray(b)
        # paths dither at bf16 resolution of the per-step delta; after 35
        # steps the accumulated divergence stays ~1e-2 on O(1) params
        np.testing.assert_allclose(b, a, rtol=0, atol=5e-2)

    # state dtypes actually stored bf16 (the point of the flag)
    opt = mk16()
    st = opt.init([jnp.zeros((4, 4))])
    assert st.delta[0].dtype == jnp.bfloat16
    assert st.exp_avg_sq[0].dtype == jnp.bfloat16
    # tiny keepdims stats stay f32
    assert st.param_rms[0].dtype == jnp.float32


def test_scaled_adam_f32_state_default_unchanged():
    """The default state_dtype must be a no-op: explicit float32 equals
    the implicit default bit-for-bit (guards the quantize-then-apply
    refactor against perturbing the reference-parity path)."""
    shapes = [(6, 5), (1,)]
    mk_def = lambda: scaled_adam(learning_rate=0.03,
                                 stacked_fn=lambda path: False)
    mk_f32 = lambda: scaled_adam(learning_rate=0.03,
                                 stacked_fn=lambda path: False,
                                 state_dtype=jnp.float32)
    _, pa = run_pair(shapes, make_opt=mk_def, steps=10)
    _, pb = run_pair(shapes, make_opt=mk_f32, steps=10)
    for a, b in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eve_parity():
    ref_optim = load_reference_optim()
    shapes = [(10, 8), (1,)]
    t_params, j_params = run_pair(
        shapes, lr=1e-3,
        make_ref=lambda ps: ref_optim.Eve(ps, lr=1e-3),
        make_opt=lambda: eve(learning_rate=1e-3))
    for tp, jp in zip(t_params, j_params):
        np.testing.assert_allclose(
            np.asarray(jp), tp.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_eden_schedule_values():
    ref_optim = load_reference_optim()
    m = torch.nn.Linear(4, 4)
    ref_opt = ref_optim.ScaledAdam(
        m.parameters(), lr=0.05,
        parameters_names=[["w", "b"]], show_dominant_parameters=False)
    sched = ref_optim.Eden(ref_opt, lr_batches=5000, lr_epochs=4,
                           warmup_batches=200)
    for epoch in [0, 1, 3]:
        sched.step_epoch(epoch)
        for batch in [0, 100, 500, 5000]:
            sched.batch = batch
            ref_lr = sched.get_lr()[0]
            ours = float(eden_lr(0.05, batch, epoch, lr_batches=5000,
                                 lr_epochs=4, warmup_batches=200))
            np.testing.assert_allclose(ours, ref_lr, rtol=1e-6)
