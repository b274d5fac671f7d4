import numpy as np

from lcgp_tpu.models.replication import group_replicates


def _naive_ybar(yr, inverse, n):
    p = yr.shape[0]
    ybar = np.zeros((p, n))
    for i in range(n):
        ybar[:, i] = yr[:, inverse == i].mean(axis=1)
    return ybar


class TestGrouping:
    def test_tiled_design(self):
        rng = np.random.default_rng(0)
        xu = rng.uniform(0, 1, (20, 2))
        x = np.tile(xu, (3, 1))
        y = rng.standard_normal((4, 60))
        rep = group_replicates(x, y)
        assert rep.x_unique.shape == (20, 2)
        assert (rep.r == 3).all()
        # np.unique sorts lexicographically
        order = np.lexsort(xu.T[::-1])
        np.testing.assert_allclose(rep.x_unique, xu[order])

    def test_ybar_matches_naive_loop(self):
        rng = np.random.default_rng(1)
        xu = rng.uniform(0, 1, (15, 1))
        reps = rng.integers(1, 6, 15)
        rows, cols = [], []
        for i in range(15):
            for _ in range(reps[i]):
                rows.append(xu[i])
        x = np.array(rows)
        perm = rng.permutation(len(x))
        x = x[perm]
        y = rng.standard_normal((3, len(x)))
        rep = group_replicates(x, y)
        np.testing.assert_allclose(
            rep.ybar, _naive_ybar(y, rep.group_ids, rep.x_unique.shape[0]),
            rtol=1e-12)
        # counts match multiplicity
        np.testing.assert_array_equal(np.sort(rep.r), np.sort(reps))

    def test_group_ids_consistent(self):
        rng = np.random.default_rng(2)
        x = np.repeat(rng.uniform(0, 1, (5, 2)), 2, axis=0)
        y = rng.standard_normal((2, 10))
        rep = group_replicates(x, y)
        for i, gid in enumerate(rep.group_ids):
            np.testing.assert_allclose(x[i], rep.x_unique[gid])

    def test_no_replication_identity(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (12, 2))
        y = rng.standard_normal((2, 12))
        rep = group_replicates(x, y)
        assert rep.x_unique.shape == (12, 2)
        assert (rep.r == 1).all()
        order = np.lexsort(x.T[::-1])
        np.testing.assert_allclose(rep.ybar, y[:, order])
