"""The registry order IS the driver's verification schedule (the driver
hash-checks exactly order[:50]) — pin the scheduling invariants so a
refactor can't silently waste a round's verification slot again."""

from __future__ import annotations

from query_engine_spark import registry as R


def test_order_is_a_permutation_of_the_registry():
    order = R._driver_order()
    assert len(order) == len(set(order)) == len(R.REGISTRY)
    assert set(order) == set(R.REGISTRY)


def test_never_verified_and_stale_lead_the_order():
    order = R._driver_order()
    head = set(order[:50])
    missing = [
        n
        for n in R.REGISTRY
        if (n not in R._DRIVER_LAST_VERIFIED or n in R._STALE_VERIFICATION)
        and n not in head
    ]
    assert not missing, f"unverified queries outside the driver sample: {missing}"


def test_round_touched_queries_in_the_sample():
    order = R._driver_order()
    head = set(order[:50])
    missing = [n for n in R._ROUND5_TOUCHED if n in R.REGISTRY and n not in head]
    assert not missing, f"round-touched queries outside the driver sample: {missing}"


def test_rest_ordered_least_recently_verified_first():
    order = R._driver_order()
    tail = [n for n in order if n in R._DRIVER_LAST_VERIFIED
            and n not in R._STALE_VERIFICATION and n not in R._ROUND5_TOUCHED]
    rounds = [R._DRIVER_LAST_VERIFIED[n] for n in tail]
    assert rounds == sorted(rounds)


def test_verified_names_exist_in_registry():
    unknown = [n for n in R._DRIVER_LAST_VERIFIED if n not in R.REGISTRY]
    assert not unknown, f"verified-history names missing from registry: {unknown}"
