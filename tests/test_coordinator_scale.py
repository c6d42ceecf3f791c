"""Long SharedTick drives: coordinated ticks vs serial per-robot ticks.

Kept in their own file (helpers in tests/coordutil.py) so xdist's per-file
scheduling can overlap these multi-minute drives with the rest of the
suite instead of serializing them behind test_coordinator.py's unit tests.
"""

import numpy as np

from mrg_slam_tpu.models.coordinator import SharedTick
from mrg_slam_tpu.models.backend import MrgSlam

from coordutil import drive_two, slam_config, two_robot_inputs


def test_shared_tick_matches_serial():
    """The coordinated tick must be semantically equivalent to serial
    per-robot ticks on identical inputs: same keyframes, loops found on
    both paths, and matching trajectories."""
    scans_a, scans_b, traj_a, traj_b = two_robot_inputs()

    def serial(slams, now):
        for s in slams:
            s.optimization_tick(now=now)

    ticker_state = {}

    def shared(slams, now):
        st = ticker_state.setdefault("st", SharedTick(slams))
        st.tick_all(now=now)

    a1, b1 = drive_two(scans_a, scans_b, traj_a, traj_b, serial)
    a2, b2 = drive_two(scans_a, scans_b, traj_a, traj_b, shared)

    for s1, s2 in ((a1, a2), (b1, b2)):
        k1 = len(s1.db.keyframes) + len(s1.db.new_keyframes)
        k2 = len(s2.db.keyframes) + len(s2.db.new_keyframes)
        assert k1 == k2, (k1, k2)
        l1 = sum(1 for e in s1.db.edges if e.type == "loop")
        l2 = sum(1 for e in s2.db.edges if e.type == "loop")
        assert l2 >= 1 and l2 >= l1 - 1, (l1, l2)
        t1, t2 = s1.trajectory(), s2.trajectory()
        assert t1.shape == t2.shape
        np.testing.assert_allclose(t1[:, :3], t2[:, :3], atol=0.1)
        # coordinated tick produced the same stats surface
        assert s2.tick_stats and s2.tick_stats[-1].chi2_after <= (
            s2.tick_stats[-1].chi2_before + 1e-6)
        # per-tick marginals still flow in the batched solve
        assert s2.db.graph.last_marginals is not None


def test_shared_tick_three_robots():
    """R>2: three co-hosted robots tick through one coordinator; each
    closes its own loops and the batched solve handles the 3-graph stack."""
    scans_a, scans_b, traj_a, traj_b = two_robot_inputs()
    names = ("r0", "r1", "r2")
    slams = [MrgSlam(slam_config(n, names)) for n in names]
    st = SharedTick(slams)
    feeds = [(scans_a, traj_a), (scans_b, traj_b),
             (scans_a[:50], traj_a[:50])]
    n = max(len(s) for s, _ in feeds)
    for i in range(n):
        for slam, (scans, traj) in zip(slams, feeds):
            if i < len(scans):
                slam.process_scan(i * 0.1, traj[i].astype(np.float32),
                                  scans[i])
        if (i + 1) % 10 == 0:
            out = st.tick_all(now=i * 0.1)
            assert set(out) == set(names)
    st.tick_all(now=n * 0.1)
    for slam, (scans, _) in zip(slams, feeds):
        k = len(slam.db.keyframes) + len(slam.db.new_keyframes)
        assert k >= len(scans) // 10, (slam.own_name, k)
        assert slam.db.graph.chi2_final <= slam.db.graph.chi2_initial + 1e-6
    # the two full-lap robots close loops
    for slam in slams[:2]:
        assert sum(1 for e in slam.db.edges if e.type == "loop") >= 1
