"""fp32 value parity against the reference PyTorch implementation.

Builds the reference model (torch, CPU, eval mode) with tiny dims, exports
its state_dict, imports it through ``import_torch_state_dict``, and checks
that AR/NAR losses and metrics match on identical inputs. This is the
north-star correctness check (SURVEY.md §4 implications).
"""

import functools
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_reference_valle  # noqa: E402

from valle_tpu.models import ValleConfig, valle_forward  # noqa: E402
from valle_tpu.utils.checkpoint import import_torch_state_dict  # noqa: E402

D, HEADS, LAYERS, Q = 32, 2, 2, 8
B, S, T = 2, 9, 25


class _OracleDecoder(torch.nn.Module):
    """Layer-loop driver with pre-torch-2.x semantics.

    The reference instantiates ``nn.TransformerDecoder`` over its forked
    tuple-threading layers (valle.py:61-63); torch 2.13's TransformerDecoder
    forward inspects the input tensor (``src.is_nested``) and chokes on the
    tuple. This shim restores the old "loop layers, then norm" behavior.
    """

    def __init__(self, layer, num_layers, norm=None):
        super().__init__()
        import copy

        self.layers = torch.nn.ModuleList(
            [copy.deepcopy(layer) for _ in range(num_layers)])
        self.norm = norm

    def forward(self, tgt, memory, tgt_mask=None, memory_mask=None,
                tgt_key_padding_mask=None, memory_key_padding_mask=None):
        out = tgt
        for mod in self.layers:
            out = mod(out, memory, tgt_mask=tgt_mask,
                      memory_mask=memory_mask,
                      tgt_key_padding_mask=tgt_key_padding_mask,
                      memory_key_padding_mask=memory_key_padding_mask)
        if self.norm is not None:
            out = self.norm(out)
        return out


def build_pair(model_name="valle", prefix_mode=0, prepend_bos=False,
               share_embedding=True, norm_first=True, add_prenet=False):
    ref_mod = load_reference_valle()
    torch.manual_seed(0)
    if model_name == "valle":
        ref = ref_mod.VALLE(
            D, HEADS, LAYERS, norm_first=norm_first, add_prenet=add_prenet,
            prefix_mode=prefix_mode, share_embedding=share_embedding,
            nar_scale_factor=1.0, prepend_bos=prepend_bos,
            num_quantizers=Q)
    else:
        ref = ref_mod.VALLF(
            D, HEADS, LAYERS, norm_first=norm_first, add_prenet=add_prenet,
            decoder_cls=_OracleDecoder, prefix_mode=prefix_mode,
            share_embedding=share_embedding, nar_scale_factor=1.0,
            prepend_bos=prepend_bos, num_quantizers=Q)
    ref.eval()
    cfg = ValleConfig(
        model_name=model_name, d_model=D, nhead=HEADS, num_layers=LAYERS,
        norm_first=norm_first, prefix_mode=prefix_mode,
        share_embedding=share_embedding, prepend_bos=prepend_bos,
        num_quantizers=Q, max_len=512, add_prenet=add_prenet)
    params, state = import_torch_state_dict(ref.state_dict(), cfg)
    return ref, cfg, params, state


def make_inputs(seed=1):
    g = torch.Generator().manual_seed(seed)
    x = torch.randint(0, 100, (B, S), generator=g)
    x_lens = torch.tensor([S, S - 3])
    y = torch.randint(0, 1024, (B, T, Q), generator=g)
    y_lens = torch.tensor([T, T - 6])
    return x, x_lens, y, y_lens


@pytest.mark.parametrize("model_name", ["valle", "vallf"])
@pytest.mark.parametrize("prepend_bos", [False, True])
def test_ar_loss_parity(model_name, prepend_bos):
    ref, cfg, params, state = build_pair(model_name=model_name,
                                         prepend_bos=prepend_bos)
    x, x_lens, y, y_lens = make_inputs()
    with torch.no_grad():
        _, ref_loss, ref_metrics = ref(x, x_lens, y, y_lens, train_stage=1)

    batch = {
        "text": jnp.asarray(x.numpy()),
        "text_lens": jnp.asarray(x_lens.numpy()),
        "audio": jnp.asarray(y.numpy()),
        "audio_lens": jnp.asarray(y_lens.numpy()),
    }
    fwd = jax.jit(functools.partial(
        valle_forward, cfg=cfg, train_stage=1, deterministic=True))
    loss, metrics, _ = fwd(params, batch=batch, state=state)

    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-4, atol=2e-3)
    # reference reports acc * y_lens.sum(); ours reports the fraction
    ref_acc = float(ref_metrics["ArTop10Accuracy"]) / float(y_lens.sum())
    np.testing.assert_allclose(float(metrics["ArTop10Accuracy"]), ref_acc,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_name", ["valle", "vallf"])
@pytest.mark.parametrize("share_embedding", [True, False])
def test_nar_loss_parity_mode0(model_name, share_embedding):
    ref, cfg, params, state = build_pair(
        model_name=model_name, prefix_mode=0,
        share_embedding=share_embedding)
    x, x_lens, y, y_lens = make_inputs(seed=2)

    # the reference samples nar_stage from its own random.Random(0)
    expected_stage = random.Random(0).choices(
        list(range(1, Q)), weights=[1.0 / (Q - 1)] * (Q - 1), k=1)[0]
    with torch.no_grad():
        _, ref_loss, ref_metrics = ref(x, x_lens, y, y_lens, train_stage=2)

    batch = {
        "text": jnp.asarray(x.numpy()),
        "text_lens": jnp.asarray(x_lens.numpy()),
        "audio": jnp.asarray(y.numpy()),
        "audio_lens": jnp.asarray(y_lens.numpy()),
    }
    fwd = jax.jit(functools.partial(
        valle_forward, cfg=cfg, train_stage=2, deterministic=True))
    loss, metrics, _ = fwd(params, batch=batch,
                           nar_stage=jnp.int32(expected_stage), state=state)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-4, atol=2e-3)
    ref_acc = float(ref_metrics["NarTop10Accuracy"]) / float(y_lens.sum())
    np.testing.assert_allclose(float(metrics["NarTop10Accuracy"]), ref_acc,
                               rtol=1e-4, atol=1e-5)


class _StubRng:
    """Replaces the reference model's ``self.rng`` (random.Random) so the
    host-side draws — nar_stage (valle.py:891-895), prefix-mode-2 segment
    starts (valle.py:370) — take known values we can inject into our
    forward."""

    def __init__(self, stage, starts=()):
        self.stage = stage
        self.starts = list(starts)
        self.i = 0

    def choices(self, population, weights=None, k=1):
        return [self.stage]

    def randint(self, a, b):
        v = self.starts[self.i]
        self.i += 1
        assert a <= v <= b, (a, v, b)
        return v


@pytest.mark.parametrize("model_name", ["valle", "vallf"])
def test_nar_loss_parity_mode1(model_name, monkeypatch):
    """prefix-mode 1 (the published-model default): leading same-utterance
    prefix, all 8 quantizers summed in the prompt region, loss rescaled by
    total/(total - prefix*B) (reference valle.py:346-362,935-943)."""
    ref, cfg, params, state = build_pair(model_name=model_name,
                                         prefix_mode=1)
    x, x_lens, y, y_lens = make_inputs(seed=5)
    forced_prefix = 5  # in [int_low, 2*int_low) = [4, 8) for min_len 19
    ref.rng = _StubRng(stage=4)

    real_randint = torch.randint

    def fake_randint(low, high, size=None, **kw):
        if size == ():  # the prefix_len draw (valle.py:349)
            assert low <= forced_prefix < high, (low, forced_prefix, high)
            return torch.tensor(forced_prefix)
        return real_randint(low, high, size, **kw)

    monkeypatch.setattr(torch, "randint", fake_randint)
    with torch.no_grad():
        _, ref_loss, ref_metrics = ref(x, x_lens, y.clone(), y_lens,
                                       train_stage=2)
    monkeypatch.undo()

    batch = {
        "text": jnp.asarray(x.numpy()),
        "text_lens": jnp.asarray(x_lens.numpy()),
        "audio": jnp.asarray(y.numpy()),
        "audio_lens": jnp.asarray(y_lens.numpy()),
    }
    fwd = jax.jit(functools.partial(
        valle_forward, cfg=cfg, train_stage=2, deterministic=True))
    loss, metrics, _ = fwd(params, batch=batch, nar_stage=jnp.int32(4),
                           nar_prefix_len=jnp.int32(forced_prefix),
                           state=state)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-4, atol=2e-3)
    ref_acc = float(ref_metrics["NarTop10Accuracy"]) / float(y_lens.sum())
    np.testing.assert_allclose(float(metrics["NarTop10Accuracy"]), ref_acc,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_name", ["valle", "vallf"])
@pytest.mark.parametrize("starts", [(0, 0), (2, 7), (21, 15)])
def test_nar_loss_parity_mode2(model_name, starts, monkeypatch):
    """prefix-mode 2: random interior segment as acoustic prompt; the
    source region of the target stage is loss-masked (reference
    valle.py:363-377)."""
    ref, cfg, params, state = build_pair(model_name=model_name,
                                         prefix_mode=2)
    x, x_lens, y, y_lens = make_inputs(seed=6)
    # prefix_len = min(225, 0.25 * min_len) = 4; starts must be within
    # [0, y_lens[b] - prefix_len] = [0, 21] / [0, 15]
    ref.rng = _StubRng(stage=2, starts=starts)
    with torch.no_grad():
        _, ref_loss, ref_metrics = ref(x, x_lens, y.clone(), y_lens,
                                       train_stage=2)

    batch = {
        "text": jnp.asarray(x.numpy()),
        "text_lens": jnp.asarray(x_lens.numpy()),
        "audio": jnp.asarray(y.numpy()),
        "audio_lens": jnp.asarray(y_lens.numpy()),
    }
    fwd = jax.jit(functools.partial(
        valle_forward, cfg=cfg, train_stage=2, deterministic=True))
    loss, metrics, _ = fwd(
        params, batch=batch, nar_stage=jnp.int32(2),
        nar_prefix_starts=jnp.asarray(starts, jnp.int32), state=state)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-4, atol=2e-3)
    ref_acc = float(ref_metrics["NarTop10Accuracy"]) / float(y_lens.sum())
    np.testing.assert_allclose(float(metrics["NarTop10Accuracy"]), ref_acc,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_name", ["valle", "vallf"])
def test_nar_loss_parity_mode4(model_name):
    """prefix-mode 4: prompts supplied by the data layer."""
    ref_mod = load_reference_valle()
    ref, cfg, params, state = build_pair(model_name=model_name,
                                         prefix_mode=4)
    x, x_lens, y, y_lens = make_inputs(seed=3)
    g = torch.Generator().manual_seed(4)
    P = 6
    prompts = torch.randint(0, 1024, (B, P, Q), generator=g)
    prompts_len = torch.tensor([P, P])

    from valle.data.input_strategies import PromptedFeatures  # stubbed

    expected_stage = random.Random(0).choices(
        list(range(1, Q)), weights=[1.0 / (Q - 1)] * (Q - 1), k=1)[0]
    with torch.no_grad():
        _, ref_loss, _ = ref(
            x, x_lens, PromptedFeatures(prompts, y),
            PromptedFeatures(prompts_len, y_lens), train_stage=2)

    batch = {
        "text": jnp.asarray(x.numpy()),
        "text_lens": jnp.asarray(x_lens.numpy()),
        "audio": jnp.asarray(y.numpy()),
        "audio_lens": jnp.asarray(y_lens.numpy()),
        "prompt_codes": jnp.asarray(prompts.numpy()),
        "prompt_lens": jnp.asarray(prompts_len.numpy()),
    }
    fwd = jax.jit(functools.partial(
        valle_forward, cfg=cfg, train_stage=2, deterministic=True))
    loss, _, _ = fwd(params, batch=batch,
                     nar_stage=jnp.int32(expected_stage), state=state)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-4, atol=2e-3)
