"""No-deadlock pin for relational_meta3's concurrent join legs (r3 verdict
item 6): the three native-join legs execute pairwise under the scoped
aggregator-CPU override, which must complete — not wedge — on a small
(num_cpus=8) budget.  Runs in a fresh subprocess because the concurrency
hazard is a property of a whole Ray session's resource budget, not of the
shared 4-CPU test fixture."""

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False)
import __ray_entry__ as e
df = e.queries()["relational_meta3"]("/root/testdata/sf0.001")
kinds = sorted(df["kind"].unique())
print("KINDS=" + ",".join(kinds))
print("ROWS=%d" % len(df))
ray.shutdown()
"""

EXPECTED_KINDS = {
    "q5", "q3", "q18", "wins", "mlm", "cooc", "trend", "wow",
    "cdot", "ovl", "bask", "ridx", "fseen", "proj", "ostat",
}


def test_meta3_completes_at_8_cpus_no_deadlock():
    # the timeout IS the assertion: a join-leg wedge never returns
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=420,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    kinds_line = [l for l in r.stdout.splitlines() if l.startswith("KINDS=")]
    assert kinds_line, r.stdout
    kinds = set(kinds_line[0][len("KINDS="):].split(","))
    assert kinds == EXPECTED_KINDS, kinds ^ EXPECTED_KINDS
