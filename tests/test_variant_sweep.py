"""Full-entry variant-mode parity sweep as a pytest gate (VERDICT r7
#6): every engine-backed queries() entry must be hash-identical
between the shredded and VARIANT warehouse modes, or carry an
explicit PINNED canonicalization (tools/variant_sweep.py documents
each pin — representation-only, value equality still asserted).

Opt-in by env var: the sweep rebuilds TWO warehouses and runs ~60
entries twice, far too heavy for the default suite. Run with

    SPARK_GRAFT_VARIANT_SWEEP=1 python -m pytest tests/test_variant_sweep.py -s

(optionally SPARK_GRAFT_TEST_SF=/root/testdata/sf0.1 for the
official scale). Wiring it here keeps the sweep from silently
rotting: any entry added without variant parity fails the gate the
next time it runs.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from conftest import SF_DIR  # noqa: E402


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_VARIANT_SWEEP"),
    reason="opt-in: set SPARK_GRAFT_VARIANT_SWEEP=1 (rebuilds two "
           "warehouses and runs every engine-backed entry twice)")
def test_variant_parity_sweep_is_clean(spark):
    from tools.variant_sweep import PINNED, run_sweep
    summary = run_sweep(spark, SF_DIR)
    assert summary["diffs"] == {}, summary
    assert summary["entries_pinned_ok"] == len(PINNED), summary
    # every engine-backed entry accounted for: identical or pinned
    assert (summary["entries_ok"] + summary["entries_pinned_ok"]
            == summary["entries_engine_backed"]), summary
