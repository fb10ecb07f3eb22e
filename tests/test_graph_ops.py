import jax.numpy as jnp
import numpy as np

from moldiff_tpu.data.batching import MolBatch, pad_mols, unpad_arrays
from moldiff_tpu.ops import graph_ops


def test_triu_roundtrip():
    n = 7
    e = graph_ops.num_halfedges(n)
    x = jnp.arange(2 * e * 3, dtype=jnp.float32).reshape(2, e, 3)
    dense = graph_ops.halfedge_to_dense(x, n)
    assert dense.shape == (2, n, n, 3)
    # symmetric placement
    np.testing.assert_array_equal(
        np.asarray(dense), np.asarray(jnp.swapaxes(dense, 1, 2))
    )
    back = graph_ops.dense_to_halfedge(dense)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_symmetrize():
    n = 5
    d = jnp.arange(n * n, dtype=jnp.float32).reshape(1, n, n, 1)
    s = graph_ops.symmetrize_dense(d)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(jnp.swapaxes(s, 1, 2)))


def test_masks():
    mask = jnp.asarray([[1, 1, 1, 0, 0]], dtype=jnp.float32)
    pm = np.asarray(graph_ops.pair_mask_from_node_mask(mask))
    assert pm.sum() == 3 * 2  # 3 real atoms, directed off-diagonal pairs
    hm = np.asarray(graph_ops.halfedge_mask_from_node_mask(mask))
    assert hm.sum() == 3  # C(3,2)


def test_pad_mols_places_halfedges_by_coordinates():
    """A 3-atom molecule padded to N=5 must keep its bonds at the right
    (i, j) pairs of the larger triu order."""
    mol = {
        "node_type": np.array([0, 1, 2], dtype=np.int32),
        "pos": np.zeros((3, 3), dtype=np.float32),
        # half-edges of 3 atoms in order (0,1), (0,2), (1,2)
        "halfedge_type": np.array([1, 0, 2], dtype=np.int32),
    }
    batch = pad_mols([mol], n_max=5)
    iu, ju = graph_ops.triu_indices(5)
    he = batch.halfedge_type[0]
    lookup = {(int(i), int(j)): he[k] for k, (i, j) in enumerate(zip(iu, ju))}
    assert lookup[(0, 1)] == 1
    assert lookup[(0, 2)] == 0
    assert lookup[(1, 2)] == 2
    # all pairs involving padded atoms are 0
    for (i, j), v in lookup.items():
        if j >= 3:
            assert v == 0


def test_pad_unpad_roundtrip(rng):
    mols = []
    for n in (4, 6, 5):
        mols.append(
            {
                "node_type": rng.integers(0, 7, n).astype(np.int32),
                "pos": rng.normal(size=(n, 3)).astype(np.float32),
                "halfedge_type": rng.integers(0, 5, n * (n - 1) // 2).astype(np.int32),
            }
        )
    batch = pad_mols(mols, n_max=8)
    outs = unpad_arrays(
        {
            "pred_node": batch.node_type[..., None].astype(np.float32),
            "pred_pos": batch.pos,
            "pred_halfedge": batch.halfedge_type[..., None].astype(np.float32),
        },
        batch.n_nodes,
    )
    for mol, out in zip(mols, outs):
        np.testing.assert_array_equal(out["pred_node"][:, 0], mol["node_type"])
        np.testing.assert_array_equal(out["pred_pos"], mol["pos"])
        np.testing.assert_array_equal(out["pred_halfedge"][:, 0], mol["halfedge_type"])


def test_split_trajectories(rng):
    from moldiff_tpu.data.batching import split_trajectories
    import numpy as np

    T, b, n_max = 3, 2, 6
    e_max = n_max * (n_max - 1) // 2
    node = rng.normal(size=(T, b, n_max, 4))
    pos = rng.normal(size=(T, b, n_max, 3))
    he = rng.normal(size=(T, b, e_max, 5))
    counts = np.array([4, 6])
    per = split_trajectories((node, pos, he), counts)
    assert per[0]["node"].shape == (T, 4, 4)
    assert per[0]["halfedge"].shape == (T, 6, 5)   # E(4) = 6
    assert per[1]["halfedge"].shape == (T, 15, 5)  # E(6) = 15
    # mol 1 occupies the full bucket -> its halfedges are the identity slice
    np.testing.assert_array_equal(per[1]["halfedge"], he[:, 1])
