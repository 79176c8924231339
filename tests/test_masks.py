import jax
import jax.numpy as jnp
import numpy as np

from freeze_omni_tpu.models import masks


class TestMasks:
    def test_pad_and_valid(self):
        pm = np.asarray(masks.make_pad_mask(jnp.asarray([1, 3]), 4))
        np.testing.assert_array_equal(pm, [[0, 1, 1, 1], [0, 0, 0, 1]])
        vm = np.asarray(masks.make_valid_mask(jnp.asarray([1, 3]), 4))
        np.testing.assert_array_equal(vm, ~pm)

    def test_subsequent(self):
        m = np.asarray(masks.subsequent_mask(3)).astype(int)
        np.testing.assert_array_equal(m, [[1, 0, 0], [1, 1, 0], [1, 1, 1]])

    def test_chunked_no_left_limit(self):
        m = np.asarray(masks.subsequent_chunk_mask(6, 2, -1)).astype(int)
        # full history + within-chunk lookahead
        np.testing.assert_array_equal(m[0], [1, 1, 0, 0, 0, 0])
        np.testing.assert_array_equal(m[3], [1, 1, 1, 1, 0, 0])
        np.testing.assert_array_equal(m[5], [1, 1, 1, 1, 1, 1])

    def test_add_optional_chunk_mask_static(self):
        pad = masks.make_valid_mask(jnp.asarray([4]), 6)
        m = masks.add_optional_chunk_mask(6, pad, False, 2, 1)
        assert m.shape == (1, 6, 6)
        m = np.asarray(m)
        assert not m[0, 0, 4]  # padded key masked
        assert not m[0, 5].any()  # padded query row masked

    def test_add_optional_chunk_mask_dynamic(self):
        pad = masks.make_valid_mask(jnp.asarray([6]), 6)
        m = masks.add_optional_chunk_mask(6, pad, True, 0, 0,
                                          key=jax.random.PRNGKey(0))
        assert m.shape == (1, 6, 6)
        # lower triangle is always visible under any sampled chunk size
        tri = np.tril(np.ones((6, 6), bool))
        assert np.asarray(m)[0][tri].all()

    def test_target_mask(self):
        m = np.asarray(masks.target_mask(jnp.asarray([2]), 3)).astype(int)
        np.testing.assert_array_equal(
            m[0], [[1, 0, 0], [1, 1, 0], [0, 0, 0]])
