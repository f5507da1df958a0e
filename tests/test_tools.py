"""Smoke tests for the diagnostic tools under tools/ (VERDICT r3 item 8).

The diag scripts execute real pipelines at import time against data_synth2
artifacts, so the smoke test is byte-compilation (syntax + top-level
structure) rather than import. warmup_breakdown is additionally checked for
the graph names it must measure, which pins it to the CascadeRunner API.
"""

import ast
import glob
import os
import py_compile

import pytest

TOOLS = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "tools", "*.py"))
)


def test_tools_exist():
    names = {os.path.basename(p) for p in TOOLS}
    assert {
        "diag_cascade.py", "diag_oracle.py", "probe_local.py",
        "warmup_breakdown.py",
    } <= names


@pytest.mark.parametrize("path", TOOLS, ids=os.path.basename)
def test_tool_compiles(path):
    py_compile.compile(path, doraise=True)


def test_warmup_breakdown_covers_bench_graphs():
    src = open(
        os.path.join(os.path.dirname(TOOLS[0]), "warmup_breakdown.py")
    ).read()
    tree = ast.parse(src)
    # every CascadeRunner graph attribute the bench path can dispatch
    for attr in ("_global_fwd", "_ps_fwd", "_phase2_device",
                 "_cascade_device", "_cascade_device_ps"):
        assert attr in src, attr
    # stdout contract: one json.dumps call feeding print
    assert any(
        isinstance(n, ast.Call) and getattr(n.func, "attr", "") == "dumps"
        for n in ast.walk(tree)
    )
