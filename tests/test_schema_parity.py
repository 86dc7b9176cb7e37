"""Rejection parity with the reference's published JSON-Schema.

The reference validates all its table definitions against
``test_cases/schema/default_schema.json`` (driven by
``tests/test_validate_json.py:41-73``).  The engine re-expresses those
constraints natively in ``plans.spec.validate_reference_def`` — this
suite feeds the reference's OWN pass/fail fixtures through the engine
and, with the ``jsonschema`` library, asserts decision parity on each:
whatever the reference's CI accepts/rejects, the engine does too.

The fixtures and schema are read from /root/reference at test time
(never vendored), same pattern as test_reference_defs.py.
"""

from __future__ import annotations

import json
import os

import pytest

from ethereum_etl_airflow_spark.plans.spec import (
    SpecValidationError,
    parse_spec,
    validate_reference_def,
)

REF = "/root/reference"
CASES = os.path.join(REF, "test_cases")
SCHEMA = os.path.join(CASES, "schema", "default_schema.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SCHEMA), reason="reference checkout not present"
)

PASS = [f"correct_{c}.json" for c in "abcd"]
FAIL = [f"wrong_{c}.json" for c in "abc"]


def _load(name: str) -> dict:
    with open(os.path.join(CASES, name)) as f:
        return json.load(f)


@pytest.mark.parametrize("name", PASS)
def test_reference_pass_fixtures_accepted(name):
    spec = parse_spec(_load(name))
    assert spec.parser.selector.startswith("0x")


@pytest.mark.parametrize("name", FAIL)
def test_reference_fail_fixtures_rejected(name):
    with pytest.raises(SpecValidationError):
        parse_spec(_load(name))


@pytest.mark.parametrize("name", PASS + FAIL)
def test_decision_parity_with_jsonschema(name):
    """The library verdict and the engine verdict must agree on every
    fixture (not just the expected direction — this catches the engine
    drifting stricter/looser than the published schema on these shapes)."""
    jsonschema = pytest.importorskip("jsonschema")
    with open(SCHEMA) as f:
        schema = json.load(f)
    doc = _load(name)
    try:
        jsonschema.validate(instance=doc, schema=schema)
        ref_ok = True
    except jsonschema.exceptions.ValidationError:
        ref_ok = False
    try:
        validate_reference_def(doc)
        ours_ok = True
    except SpecValidationError:
        ours_ok = False
    assert ours_ok == ref_ok, f"{name}: engine={ours_ok} reference-schema={ref_ok}"


def test_contract_address_grammar_edges():
    """Targeted edges of the anyOf grammar beyond the three fixtures."""
    base = _load("correct_a.json")

    def with_addr(addr):
        d = json.loads(json.dumps(base))
        d["parser"]["contract_address"] = addr
        return d

    # null is allowed (schema anyOf branch 2)
    validate_reference_def(with_addr(None))
    # ref() subquery allowed
    validate_reference_def(
        with_addr("SELECT pair FROM ref('Factory_event_PairCreated')")
    )
    # uppercase literal rejected (the wrong_a defect, minimized)
    with pytest.raises(SpecValidationError):
        validate_reference_def(
            with_addr("0x" + "AB" * 20)
        )
    # short literal rejected
    with pytest.raises(SpecValidationError):
        validate_reference_def(with_addr("0xabc"))
    # empty-name abi input rejected (schema minLength 1)
    d = json.loads(json.dumps(base))
    d["parser"]["abi"]["inputs"][0]["name"] = ""
    with pytest.raises(SpecValidationError):
        validate_reference_def(d)
    # missing table_description rejected (schema requires the key)
    d = json.loads(json.dumps(base))
    del d["table"]["table_description"]
    with pytest.raises(SpecValidationError):
        validate_reference_def(d)
