import numpy as np
import pytest

from valle_tpu.utils import (
    AttributeDict,
    MetricsTracker,
    SymbolTable,
    make_pad_mask,
    str2bool,
)


def test_symbol_table_roundtrip(tmp_path):
    table = SymbolTable()
    assert table["<eps>"] == 0
    table.add("a")
    table.add("b")
    idx = table.add("c", 10)
    assert idx == 10
    assert table["a"] == 1
    assert table[10] == "c"
    assert "b" in table
    assert 99 not in table

    path = tmp_path / "syms.k2symbols"
    table.to_file(path)
    loaded = SymbolTable.from_file(path)
    assert loaded == table
    assert loaded.symbols == table.symbols
    assert loaded.ids == table.ids


def test_symbol_table_merge():
    a = SymbolTable()
    a.add("x")
    b = SymbolTable()
    b.add("y")
    m = a.merge(b)
    assert "x" in m and "y" in m
    assert m["x"] == 1


def test_symbol_table_duplicate_rejected():
    t = SymbolTable()
    t.add("a", 1)
    with pytest.raises(ValueError):
        t._check_and_insert("b", 1)


def test_make_pad_mask():
    lengths = np.array([1, 3, 2])
    mask = np.asarray(make_pad_mask(np.asarray(lengths), max_len=4))
    expected = np.array(
        [
            [False, True, True, True],
            [False, False, False, True],
            [False, False, True, True],
        ]
    )
    np.testing.assert_array_equal(mask, expected)


def test_attribute_dict_and_str2bool():
    d = AttributeDict({"a": 1})
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    assert str2bool("true") and not str2bool("0")
    with pytest.raises(Exception):
        str2bool("maybe")


def test_metrics_tracker():
    m1 = MetricsTracker()
    m1["loss"] += 10.0
    m1["frames"] += 5
    m2 = MetricsTracker()
    m2["loss"] += 2.0
    m2["frames"] += 1
    tot = m1 + m2
    assert tot["loss"] == 12.0 and tot["frames"] == 6
    scaled = tot * 0.5
    assert scaled["loss"] == 6.0
    items = dict(tot.norm_items())
    assert items["loss"] == 2.0  # 12 / 6 frames
    assert "over" in str(tot)


# ---------------------------------------------------------------------------
# dropout mask sampling (valle_tpu/modules/embedding.py)
# ---------------------------------------------------------------------------


def test_dropout_8bit_masks_unbiased():
    """The default 8-bit random masks quantize the drop rate to 1/256 but
    rescale by the QUANTIZED keep probability, so E[dropout(x)] == x; the
    32-bit bernoulli path stays available via the module flag."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from valle_tpu.modules import embedding as emb

    x = jnp.ones((512, 512), jnp.float32)
    rate = 0.1
    for bits in (8, 32):
        was = emb._DROPOUT_BITS
        emb._DROPOUT_BITS = bits
        try:
            y = np.asarray(emb.dropout(x, rate, jax.random.PRNGKey(0),
                                       deterministic=False))
        finally:
            emb._DROPOUT_BITS = was
        kept = y != 0.0
        expected_keep = (1.0 - round(rate * 256) / 256 if bits == 8
                         else 1.0 - rate)
        assert abs(kept.mean() - expected_keep) < 5e-3, (bits, kept.mean())
        # inverted-dropout rescale: surviving values are x / keep_p
        np.testing.assert_allclose(y[kept], 1.0 / expected_keep, rtol=1e-6)
        # unbiased estimator: mean over many elements ~ x
        assert abs(y.mean() - 1.0) < 5e-3, (bits, y.mean())
    # deterministic path untouched
    out = emb.dropout(x, rate, None, deterministic=True)
    assert out is x
