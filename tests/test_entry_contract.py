"""Driver-contract invariants for __spark_entry__.py.

Round-4 regression: the driver's correctness report caps at 50 queries —
CORRECTNESS_r04 reported 50 of 51 registry entries and ``frame_sample``
(the 51st) silently fell off.  Pin the cap so adding a query forces a
conscious merge/trim instead of silent coverage loss.
"""

import sys

sys.path.insert(0, ".")

import __spark_entry__ as E

DRIVER_REPORT_CAP = 50


def test_registry_fits_driver_cap():
    qs = E.queries()
    assert len(qs) <= DRIVER_REPORT_CAP, (
        f"{len(qs)} queries > driver report cap {DRIVER_REPORT_CAP}: "
        "entries past the cap are silently dropped from CORRECTNESS_rN "
        "(observed round 4). Merge or trim before adding."
    )


def test_every_oracle_has_a_query():
    qs, oq = E.queries(), E.oracle_sql()
    orphans = set(oq) - set(qs)
    assert not orphans, f"oracle_sql entries without queries(): {orphans}"


def test_registry_keys_are_unique_callables():
    qs = E.queries()
    assert all(callable(v) for v in qs.values())
    # dict keys are unique by construction; guard against an accidental
    # duplicate function wired under two names hiding a dropped operator
    fns = list(qs.values())
    assert len(set(fns)) == len(fns), "two registry names share one callable"
