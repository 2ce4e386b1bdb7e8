import numpy as np
import pytest

from gyroflow_tpu.core import quaternion as q
from gyroflow_tpu.core.time_quat import TimeQuat, interp_series


def rand_unit(n, rng):
    v = rng.standard_normal((n, 4))
    return q.normalize(v)


class TestBasics:
    def test_identity(self):
        assert np.allclose(q.identity(), [1, 0, 0, 0])
        assert q.identity((3, 2)).shape == (3, 2, 4)

    def test_multiply_identity(self):
        rng = np.random.default_rng(0)
        a = rand_unit(10, rng)
        assert np.allclose(q.multiply(a, q.identity((10,))), a)
        assert np.allclose(q.multiply(q.identity((10,)), a), a)

    def test_multiply_inverse(self):
        rng = np.random.default_rng(1)
        a = rand_unit(10, rng)
        assert np.allclose(q.multiply(a, q.inverse(a)), q.identity((10,)), atol=1e-12)

    def test_multiply_known(self):
        # i*j = k in Hamilton convention
        i = np.array([0.0, 1, 0, 0])
        j = np.array([0.0, 0, 1, 0])
        k = np.array([0.0, 0, 0, 1])
        assert np.allclose(q.multiply(i, j), k)
        assert np.allclose(q.multiply(j, i), -k)

    def test_rotate_vector_matches_matrix(self):
        rng = np.random.default_rng(2)
        a = rand_unit(20, rng)
        v = rng.standard_normal((20, 3))
        rv = q.rotate_vector(a, v)
        m = q.to_rotation_matrix(a)
        mv = np.einsum("nij,nj->ni", m, v)
        assert np.allclose(rv, mv, atol=1e-12)

    def test_axis_angle_90deg_z(self):
        qz = q.from_axis_angle(np.array([0.0, 0, 1]), np.pi / 2)
        v = q.rotate_vector(qz, np.array([1.0, 0, 0]))
        assert np.allclose(v, [0, 1, 0], atol=1e-12)

    def test_rotvec_roundtrip(self):
        rng = np.random.default_rng(3)
        rv = rng.standard_normal((50, 3)) * 2.0
        qq = q.from_rotvec(rv)
        back = q.to_rotvec(qq)
        # to_rotvec returns angle in [0, 2pi) on the w>=0 branch; wrap original
        ang = np.linalg.norm(rv, axis=-1, keepdims=True)
        assert np.allclose(q.from_rotvec(back), qq * np.sign(qq[..., :1] + 1e-300)) or \
            np.allclose(np.abs(np.sum(q.from_rotvec(back) * qq, axis=-1)), 1.0, atol=1e-9)
        del ang

    def test_rotvec_small_angle(self):
        rv = np.array([[1e-12, 0, 0]])
        qq = q.from_rotvec(rv)
        assert np.allclose(qq, [[1, 5e-13, 0, 0]], atol=1e-15)

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(4)
        a = rand_unit(100, rng)
        m = q.to_rotation_matrix(a)
        b = q.from_rotation_matrix(m)
        # same rotation up to sign
        assert np.allclose(np.abs(np.sum(a * b, axis=-1)), 1.0, atol=1e-9)

    def test_matrix_orthonormal(self):
        rng = np.random.default_rng(5)
        a = rand_unit(10, rng)
        m = q.to_rotation_matrix(a)
        eye = np.einsum("nij,nkj->nik", m, m)
        assert np.allclose(eye, np.eye(3), atol=1e-12)
        assert np.allclose(np.linalg.det(m), 1.0)


class TestSlerp:
    def test_endpoints(self):
        rng = np.random.default_rng(6)
        a, b = rand_unit(2, rng)
        assert np.allclose(q.slerp(a, b, 0.0), a, atol=1e-12)
        assert np.allclose(q.slerp(a, b, 1.0), b, atol=1e-12)

    def test_half_angle(self):
        a = q.identity()
        b = q.from_axis_angle(np.array([0.0, 0, 1]), np.pi / 2)
        mid = q.slerp(a, b, 0.5)
        expect = q.from_axis_angle(np.array([0.0, 0, 1]), np.pi / 4)
        assert np.allclose(mid, expect, atol=1e-12)

    def test_no_hemisphere_flip(self):
        # nalgebra semantics: slerp(-a-side) goes the long way; we match that.
        a = q.identity()
        b = -q.from_axis_angle(np.array([0.0, 0, 1]), np.pi / 2)
        mid = q.slerp(a, b, 0.5)
        # interpolating toward the negated quat: dot < cos(45 deg)
        assert np.sum(mid * a) < np.cos(np.pi / 8)

    def test_shortest_flips(self):
        a = q.identity()
        b = -q.from_axis_angle(np.array([0.0, 0, 1]), np.pi / 2)
        mid = q.slerp_shortest(a, b, 0.5)
        expect = q.from_axis_angle(np.array([0.0, 0, 1]), np.pi / 4)
        assert np.allclose(np.abs(np.sum(mid * expect)), 1.0, atol=1e-9)

    def test_identical(self):
        a = q.from_axis_angle(np.array([1.0, 0, 0]), 0.3)
        assert np.allclose(q.slerp(a, a, 0.7), a, atol=1e-12)


class TestTimeQuat:
    def make(self):
        ts = np.array([0, 1000, 2000, 3000], dtype=np.int64)  # µs
        qs = np.stack([
            q.identity(),
            q.from_axis_angle(np.array([0.0, 0, 1]), 0.1),
            q.from_axis_angle(np.array([0.0, 0, 1]), 0.2),
            q.from_axis_angle(np.array([0.0, 0, 1]), 0.3),
        ])
        return TimeQuat(ts, qs)

    def test_exact_hits(self):
        tq = self.make()
        assert np.allclose(tq.at_timestamp(1.0), tq.quats[1], atol=1e-12)
        assert np.allclose(tq.at_timestamp(0.0), tq.quats[0], atol=1e-12)
        assert np.allclose(tq.at_timestamp(3.0), tq.quats[3], atol=1e-12)

    def test_interpolation(self):
        tq = self.make()
        got = tq.at_timestamp(1.5)
        expect = q.from_axis_angle(np.array([0.0, 0, 1]), 0.15)
        assert np.allclose(got, expect, atol=1e-9)

    def test_clamping(self):
        tq = self.make()
        assert np.allclose(tq.at_timestamp(-5.0), tq.quats[0], atol=1e-12)
        assert np.allclose(tq.at_timestamp(99.0), tq.quats[-1], atol=1e-12)

    def test_vectorized(self):
        tq = self.make()
        ts = np.array([0.0, 0.5, 1.0, 2.75])
        got = tq.at_timestamp(ts)
        assert got.shape == (4, 4)
        for i, t in enumerate(ts):
            assert np.allclose(got[i], tq.at_timestamp(float(t)), atol=1e-12)

    def test_too_few_samples(self):
        tq = TimeQuat(np.array([0], dtype=np.int64), q.identity((1,)))
        assert np.allclose(tq.at_timestamp(1.0), q.identity())

    def test_rounding_to_us(self):
        tq = self.make()
        # 0.9999 ms rounds to 1000µs == exact hit
        assert np.allclose(tq.at_timestamp(0.9999996), tq.quats[1], atol=1e-12)

    def test_from_dict(self):
        d = {2000: q.identity(), 0: q.from_axis_angle(np.array([1.0, 0, 0]), 0.5)}
        tq = TimeQuat.from_dict(d)
        assert tq.timestamps_us.tolist() == [0, 2000]


class TestInterpSeries:
    def test_empty_single(self):
        assert interp_series(np.zeros(0, np.int64), np.zeros(0), 5.0) == 0.0
        assert interp_series(np.array([100], np.int64), np.array([7.0]), 5.0) == 7.0

    def test_linear(self):
        ts = np.array([0, 1000], dtype=np.int64)
        vs = np.array([0.0, 10.0])
        assert np.isclose(interp_series(ts, vs, 0.5), 5.0)

    def test_extrapolation_clamped_bracket(self):
        # reference clamps the lookup key to [first+1, last-1] but uses the raw
        # query in the fraction -> linear extrapolation beyond ends
        ts = np.array([0, 1000], dtype=np.int64)
        vs = np.array([0.0, 10.0])
        assert np.isclose(interp_series(ts, vs, 2.0), 20.0)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
