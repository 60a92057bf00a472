"""Keep the scaling report machinery from rotting.

SCALING.json (BASELINE.md's reporting row) is produced by
scaling_bench.measure(); this smoke test runs the same sharded program at
1 and 2 devices on the virtual CPU mesh (conftest forces 8 devices), so a
refactor that breaks the report surfaces in CI rather than at report time.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_measure_runs_at_1_and_2_devices():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from scaling_bench import measure

    pps1, batch1 = measure(1, 1, iters=1)
    pps2, batch2 = measure(1, 2, iters=1)
    assert batch1 == 1 and batch2 == 2
    assert pps1 > 0 and pps2 > 0
