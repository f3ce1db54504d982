import numpy as np

from slimm_tpu.state import fmt_float, quantile_cut_off, seq_sum_f32


class TestQuantileCutOff:
    """Exact mass-quantile semantics (misc.hpp:197-216)."""

    def test_empty(self):
        assert quantile_cut_off([], 0.95) == 0

    def test_single(self):
        assert quantile_cut_off([3.0], 0.95) == np.float32(3.0)

    def test_walk_from_top(self):
        # v = [1,2,3,4], total=10, q=0.5: sub=0(<0.5 ratio 0) add 4 → i=2;
        # ratio 0.4 < 0.5 → add 3 → i=1; ratio 0.7 ≥ 0.5 → stop; cutoff=v[1]=2
        assert quantile_cut_off([4.0, 2.0, 1.0, 3.0], 0.5) == np.float32(2.0)

    def test_q_zero_returns_max(self):
        # ratio 0 < 0 is false immediately → cutoff = top element
        assert quantile_cut_off([5.0, 1.0, 9.0], 0.0) == np.float32(9.0)

    def test_walks_to_bottom(self):
        # q=1.0 never satisfied until i hits 0 → cutoff = v[0] = min
        assert quantile_cut_off([5.0, 1.0, 9.0], 1.0) == np.float32(1.0)

    def test_all_zero_nan_guard(self):
        # total = 0 → 0/0 = NaN; NaN < q false → loop never runs → max = 0
        assert quantile_cut_off([0.0, 0.0, 0.0], 0.95) == np.float32(0.0)

    def test_integer_values(self):
        assert quantile_cut_off([10, 20, 30, 40], 0.5) == np.float32(20)


class TestFmtFloat:
    """C++ default-ostream float formatting (6 significant digits)."""

    def test_basic(self):
        assert fmt_float(100.0) == "100"
        assert fmt_float(0.05) == "0.05"
        assert fmt_float(33.333333) == "33.3333"
        assert fmt_float(0.0) == "0"
        assert fmt_float(1.0 / 3.0) == "0.333333"

    def test_scientific(self):
        assert fmt_float(1e-5) == "1e-05"
        assert fmt_float(1234567.0) == "1.23457e+06"

    def test_float32_rounding(self):
        # value must round through float32 first
        assert fmt_float(np.float32(0.1)) == "0.1"


def test_seq_sum_f32_matches_sequential():
    vals = [0.1, 0.2, 0.7, 1e-8, 3.3]
    acc = np.float32(0.0)
    for v in vals:
        acc = np.float32(acc + np.float32(v))
    assert seq_sum_f32(vals) == acc
