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
    missing = [n for n in R._ROUND_TOUCHED if n in R.REGISTRY and n not in head]
    assert not missing, f"round-touched queries outside the driver sample: {missing}"


def test_rest_ordered_least_recently_verified_first():
    order = R._driver_order()
    tail = [n for n in order if n in R._DRIVER_LAST_VERIFIED
            and n not in R._STALE_VERIFICATION and n not in R._ROUND_TOUCHED]
    rounds = [R._DRIVER_LAST_VERIFIED[n] for n in tail]
    assert rounds == sorted(rounds)


def test_verified_names_exist_in_registry():
    unknown = [n for n in R._DRIVER_LAST_VERIFIED if n not in R.REGISTRY]
    assert not unknown, f"verified-history names missing from registry: {unknown}"


def test_last_verified_map_matches_correctness_artifacts():
    """_DRIVER_LAST_VERIFIED is transcribed from the CORRECTNESS_rN.json
    artifacts — derive it from the files and compare, so the ledger can't
    drift from the record. Rows-only queries (no SQL oracle, hash_match
    never true) count at rows_match. When an artifact NEWER than the
    ledger exists (the driver drops CORRECTNESS_r{N}.json after the round
    closes), rounds > ledger_max are excluded from the derivation and the
    check still runs for everything ≤ ledger_max — the old behavior was a
    blanket skip, which left ledger drift for ALL prior rounds unchecked
    until the transcription landed (ADVICE r10). A warning still nags for
    the transcription."""
    import glob
    import json
    import os
    import re
    import warnings

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ledger_max = max(R._DRIVER_LAST_VERIFIED.values())
    derived: dict[str, int] = {}
    # CORRECTNESS_r*.json with r(\d+), NOT r0* / r0(\d+): the narrower
    # pattern silently skipped two-digit rounds (r10+), so the drift test
    # would keep passing against a stale ledger (ADVICE r9).
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        if rnd > ledger_max:
            warnings.warn(
                f"CORRECTNESS_r{rnd}.json is newer than the ledger (max r"
                f"{ledger_max}): transcribe its green rows into "
                "_DRIVER_LAST_VERIFIED (tools/ledger_transcribe.py), then "
                "clear _STALE/_ROUND{N}_TOUCHED for the new round",
                stacklevel=1,
            )
            continue
        for name, row in json.load(open(path)).items():
            # rows-only queries (no SQL oracle) record err='no_oracle' with
            # spark_rows > 0 — the driver's weaker check; count it. The
            # tuple is exactly tools/ledger_transcribe.py's ROWS_ONLY_OK
            # (multimodal_features removed r11 — it has a real oracle).
            ok = (row.get("err") is None and row.get("rows_match")
                  and row.get("schema_match") and row.get("hash_match")) or (
                row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0
                and name in ("o4_sort_random", "f12_where_udf_tier")
            )
            if ok:
                derived[name] = max(derived.get(name, 0), rnd)
    assert derived == dict(R._DRIVER_LAST_VERIFIED), {
        n: (R._DRIVER_LAST_VERIFIED.get(n), derived.get(n))
        for n in set(derived) | set(R._DRIVER_LAST_VERIFIED)
        if derived.get(n) != R._DRIVER_LAST_VERIFIED.get(n)
    }


def test_rows_only_allowance_matches_the_tool_and_oracle_reality():
    """The rows-only allowance exists for exactly the two queries DESIGNED
    without a SQL oracle (seeded shuffle, sandboxed-UDF tier). Every other
    registry query must carry a real oracle — if one silently lost its
    oracle, the ledger tool would otherwise count the driver's weaker
    rows-only row as 'verified' (ADVICE r10 found the stale
    multimodal_features entry masking exactly this risk)."""
    import importlib

    tool = importlib.import_module("tools.ledger_transcribe")
    assert tuple(sorted(tool.ROWS_ONLY_OK)) == (
        "f12_where_udf_tier", "o4_sort_random",
    )
    missing = [
        n for n, spec in R.REGISTRY.items()
        if spec.oracle is None and n not in tool.ROWS_ONLY_OK
    ]
    assert not missing, f"registry queries with no oracle: {missing}"
    for n in tool.ROWS_ONLY_OK:
        assert R.REGISTRY[n].oracle is None, (
            f"{n} has an oracle now — remove it from ROWS_ONLY_OK"
        )


def test_candidate_absorption_survives_either_import_order():
    """The r8/r9 candidate modules register via an END-OF-MODULE callback
    into registry.REGISTRY precisely so that whichever module leads the
    import, the registry absorbs the COMPLETE candidate dict (an
    import-time loop in registry.py would see a partially-built dict
    when the candidate module leads). Pin both orders in fresh
    interpreters."""
    import subprocess
    import sys

    prog_tail = (
        "from query_engine_spark import registry as R;"
        "from query_engine_spark import registry_r8 as r8;"
        "from query_engine_spark import registry_r9 as r9;"
        "from query_engine_spark import registry_r10 as r10;"
        "missing8 = [n for n in r8.CANDIDATES if n not in R.REGISTRY];"
        "missing9 = [n for n in r9.CANDIDATES if n not in R.REGISTRY];"
        "missing10 = [n for n in r10.CANDIDATES if n not in R.REGISTRY];"
        "assert not missing8 and not missing9 and not missing10,"
        " (missing8, missing9, missing10);"
        "print(len(R.REGISTRY))"
    )
    for lead in (
        "from query_engine_spark import registry;",
        "from query_engine_spark import registry_r10;",
        "from query_engine_spark import registry_r9;",
        "from query_engine_spark import registry_r8;",
    ):
        out = subprocess.run(
            [sys.executable, "-c", lead + prog_tail],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, (lead, out.stderr[-800:])
        assert out.stdout.strip() == "272", (lead, out.stdout)
