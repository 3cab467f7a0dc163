"""End-to-end operator round flow (the reference's canonical example,
`backend/examples/summa_solvency_flow.rs`) as a gated test."""

import os
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("CIRCUITS_TPU_SLOW"),
    reason="full round flow (~2 min); run with CIRCUITS_TPU_SLOW=1",
)


def test_summa_solvency_flow(tmp_path, monkeypatch):
    sys.path.insert(0, str(Path(__file__).parent.parent / "examples"))
    import summa_solvency_flow

    # redirect the JSON export into the pytest tmpdir
    monkeypatch.setattr(summa_solvency_flow, "HERE", str(tmp_path))
    summa_solvency_flow.main()
    assert (tmp_path / "inclusion_proof_solidity_calldata.json").exists()
