"""Driver-contract invariants for __spark_entry__ (no Spark needed).

The driver's correctness checker attests only the FIRST 50 ``queries()``
entries (discovered round 5: nine dedup/multimodal rows silently rode
outside the gate). These tests freeze the budget conventions so a future
registry edit cannot regress them unnoticed.
"""

import importlib.util
import os

import pytest

_BUDGET = 50


@pytest.fixture(scope="module")
def entry_mod():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("entry_contract_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_budget_row_has_an_oracle(entry_mod):
    """A queries() entry inside the driver's 50-row budget without an
    oracle_sql() twin burns an attestation slot on a rows-only check."""
    q = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    missing = [k for k in q[:_BUDGET] if k not in oracles]
    assert not missing, f"budget rows without oracle: {missing}"


def test_every_family_represented_inside_budget(entry_mod):
    q = list(entry_mod.queries())
    families = {k.split("_")[0] for k in q}
    in_budget = {k.split("_")[0] for k in q[:_BUDGET]}
    assert families == in_budget, f"families outside budget: {families - in_budget}"


def test_tail_rows_are_redundant_variants_only(entry_mod):
    """Everything past the budget must be a same-family variant of an
    in-budget row — never the sole representative of an operator."""
    q = list(entry_mod.queries())
    in_budget = {k.split("_")[0] for k in q[:_BUDGET]}
    for k in q[_BUDGET:]:
        assert k.split("_")[0] in in_budget, f"{k} has no in-budget sibling"


def test_oracles_reference_declared_queries(entry_mod):
    q = set(entry_mod.queries())
    extra = [k for k in entry_mod.oracle_sql() if k not in q]
    assert not extra, f"oracle rows with no query: {extra}"


def test_queries_are_callables_with_unique_names(entry_mod):
    q = entry_mod.queries()
    assert all(callable(f) for f in q.values())
    assert len(q) == len(set(q))
