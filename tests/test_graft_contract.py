"""Driver-contract tests: dryrun_multichip works on the virtual CPU mesh
and bench.py keeps its one-JSON-line stdout contract."""

import json
import pytest
import subprocess
import sys


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally on finite loss


def test_bench_has_json_contract_fields():
    # static check of the printed dict structure (running bench needs TPU)
    import ast
    from pathlib import Path

    src = Path("bench.py").read_text()
    assert '"metric"' in src and '"value"' in src
    assert '"unit"' in src and '"vs_baseline"' in src
    ast.parse(src)  # syntactically valid


def test_entry_is_importable_and_returns_spec():
    import inspect

    import __graft_entry__ as g

    sig = inspect.signature(g.entry)
    assert len(sig.parameters) == 0
    sig2 = inspect.signature(g.dryrun_multichip)
    assert list(sig2.parameters) == ["n_devices"]
