"""Data-layer tests (reference: test_dataview.py et al. — round-trip
values/masks, iteration/aggregation equivalence, ragged and sparse views)."""

import jax.numpy as jnp
import numpy as np
import pytest

from common_tpu import models
from common_tpu import state as st
from common_tpu.data import (
    numpy_dataview,
    sparse_ndarray_dataview,
    variadic_dataview,
)


class TestRecarray:
    def test_structured_roundtrip(self):
        arr = np.zeros(4, dtype=[("f0", np.int64), ("f1", np.float32)])
        arr["f0"] = [1, 0, 1, 1]
        arr["f1"] = [0.5, -1.0, 2.0, 0.0]
        view = numpy_dataview(arr)
        assert len(view) == 4
        (v0, m0), (v1, m1) = view.columns
        np.testing.assert_array_equal(np.asarray(v0), arr["f0"])
        np.testing.assert_allclose(np.asarray(v1), arr["f1"])
        np.testing.assert_array_equal(np.asarray(m0), np.ones(4))

    def test_masked_cells(self):
        base = np.zeros(3, dtype=[("x", np.float64)])
        base["x"] = [1.0, 2.0, 3.0]
        marr = np.ma.masked_array(base, mask=[(False,), (True,), (False,)])
        view = numpy_dataview([marr["x"]])
        (_, m0) = view.columns[0]
        np.testing.assert_array_equal(np.asarray(m0), [1.0, 0.0, 1.0])
        back = view.toarray()[0]
        assert back.mask.tolist() == [False, True, False]

    def test_vector_cell_mask_any(self):
        x = np.ma.masked_array(
            np.arange(6, dtype=np.float32).reshape(3, 2),
            mask=[[False, False], [False, True], [False, False]],
        )
        view = numpy_dataview([x])
        (_, m) = view.columns[0]
        np.testing.assert_array_equal(np.asarray(m), [1.0, 0.0, 1.0])

    def test_row_count_mismatch_raises(self):
        with pytest.raises(ValueError, match="row count"):
            numpy_dataview([np.zeros(3), np.zeros(4)])

    def test_defn_schema_validation(self):
        defn = st.model_definition(3, [models.niw(2)], k_max=4)
        with pytest.raises(ValueError, match="per-row shape"):
            numpy_dataview([np.zeros((3, 5), np.float32)], defn)
        ok = numpy_dataview([np.zeros((3, 2), np.float64)], defn)
        assert ok.columns[0][0].dtype == jnp.float32

    def test_feeds_initialize(self):
        r = np.random.default_rng(0)
        defn = st.model_definition(5, [models.nich], k_max=4)
        view = numpy_dataview([r.normal(size=5).astype(np.float32)], defn)
        s = st.initialize(
            defn, view.view(), jnp.asarray([0]),  # key unused w/ assignment
            assignment=jnp.asarray([0, 0, 1, 1, 1], jnp.int32),
        )
        assert int(s.ngroups()) == 2


class TestVariadic:
    def test_csr_layout(self):
        rows = [[1, 2, 3], [4], [5, 6]]
        v = variadic_dataview(rows)
        np.testing.assert_array_equal(np.asarray(v.tokens), [1, 2, 3, 4, 5, 6])
        np.testing.assert_array_equal(np.asarray(v.row_ptr), [0, 3, 4, 6])
        np.testing.assert_array_equal(np.asarray(v.doc_ids), [0, 0, 0, 1, 2, 2])
        assert v.rowsize(0) == 3 and v.rowsize(1) == 1
        assert [r.tolist() for r in v.toarray()] == rows

    def test_padding(self):
        v = variadic_dataview([[1, 2], [3]], pad_to=8)
        assert v.tokens.shape == (8,)
        np.testing.assert_array_equal(
            np.asarray(v.token_mask), [1, 1, 1, 0, 0, 0, 0, 0]
        )
        # padded doc_ids route to scratch segment n
        assert np.asarray(v.doc_ids)[3:].tolist() == [2] * 5

    def test_pad_too_small_raises(self):
        with pytest.raises(ValueError, match="pad_to"):
            variadic_dataview([[1, 2, 3]], pad_to=2)


class TestSparse:
    def test_from_dense_with_mask(self):
        dense = np.array([[1, 0], [0, 5]], np.int32)
        missing = np.array([[False, True], [False, False]])
        v = sparse_ndarray_dataview(dense=dense, missing_mask=missing)
        assert v.nobserved() == 3
        back = v.todense()
        np.testing.assert_array_equal(back.mask, missing)
        np.testing.assert_array_equal(
            np.ma.getdata(back)[~missing], dense[~missing]
        )

    def test_from_coo(self):
        idx = np.array([[0, 1], [2, 0]], np.int32)
        vals = np.array([7.0, 9.0])
        v = sparse_ndarray_dataview(indices=idx, values=vals, shape=(3, 2))
        assert v.ndim == 2
        d = v.todense()
        assert d[0, 1] == 7.0 and d[2, 0] == 9.0
        assert d.mask.sum() == 4

    def test_padding_masks(self):
        # dense with no missing-mask: ALL cells observed (zeros included)
        v = sparse_ndarray_dataview(dense=np.eye(2), pad_to=6)
        assert v.values.shape == (6,)
        assert v.nobserved() == 4
        np.testing.assert_array_equal(np.asarray(v.mask), [1, 1, 1, 1, 0, 0])

    def test_masked_dense_input(self):
        dense = np.ma.masked_array(np.eye(3), mask=np.eye(3) == 0)
        v = sparse_ndarray_dataview(dense=dense)
        assert v.nobserved() == 3
