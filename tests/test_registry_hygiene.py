"""Registry hygiene: every query is oracle-checked unless it is on the
explicit rows-only allowlist with a structural reason. A new operator
landing without an oracle fails here instead of silently weakening the
correctness gate.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

#: Entries that CANNOT have a value-hash oracle, and why. Keep this
#: list justified — "I didn't write one" is not a reason.
ROWS_ONLY_ALLOWED: dict[str, str] = {
    "approx_distinct_customers_by_nation": "HLL++ sketch tier — approximate by design, error-bound pytest",
    "feat_vocab_topk_sketch": "approx_top_k sketch tier — approximate by design",
    "temporal_value_percentiles_approx": "approx_percentile sketch tier — approximate by design",
    "sim_lsh_topk": "probabilistic recall — recall-floor pytest vs brute force",
    "sim_ivf_topk": "probabilistic recall — recall-floor pytest vs brute force",
    "multimodal_resize": "binary payload output — engines stringify bytes differently",
    "multimodal_frame_sample": "binary payload output — engines stringify bytes differently",
}


def test_every_query_is_oracle_checked_or_justified():
    queries = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    unjustified = queries - oracles - set(ROWS_ONLY_ALLOWED)
    assert not unjustified, (
        f"entries without an oracle or an allowlist justification: "
        f"{sorted(unjustified)}"
    )
    # the allowlist must not rot: no justified entry may be missing
    # from the registry, and none may (now) have an oracle
    ghost = set(ROWS_ONLY_ALLOWED) - queries
    assert not ghost, f"allowlisted entries not in the registry: {sorted(ghost)}"
    upgraded = set(ROWS_ONLY_ALLOWED) & oracles
    assert not upgraded, (
        f"entries gained oracles — remove from allowlist: {sorted(upgraded)}"
    )


def test_oracles_reference_registered_queries_only():
    extra = set(entrymod.oracle_sql()) - set(entrymod.queries())
    assert not extra, f"oracles without a query: {sorted(extra)}"
