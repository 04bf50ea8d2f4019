"""Demo-notebook validation (VERDICT round 2, item 7; round 4, missing 3).

The notebooks mirror the reference's demos/*.ipynb, whose notebooks are
its ONLY integration test (SURVEY section 4).  Two layers here:

  * static checks (fast, every run): JSON/nbformat shape, code-cell
    syntax, and that every `centroidal_mpc_tpu` symbol and module
    attribute the cells reference actually exists;
  * an EXECUTED run (slow-marked): the trot notebook runs end-to-end
    via nbclient at the reduced-scale `solo12_trot_mini` preset
    (N=18 step-in-place trot) on CPU -- warm start, nominal SCP,
    stochastic SCP, plots, whole-body layer, 3D preview and
    Monte-Carlo all actually execute, so "the demo runs" is tested,
    not assumed.  The full-scale cells keep the static checks.
"""
import ast
import importlib
import json
import os
import pathlib

import pytest

DEMOS = pathlib.Path(__file__).resolve().parent.parent / "demos"
NOTEBOOKS = ["trot_demo.ipynb", "bound_demo.ipynb"]


def _code_cells(name):
    nb = json.loads((DEMOS / name).read_text())
    assert nb["nbformat"] == 4
    assert any(c["cell_type"] == "markdown" for c in nb["cells"])
    return ["".join(c["source"]) for c in nb["cells"]
            if c["cell_type"] == "code"]


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_cells_compile(name):
    cells = _code_cells(name)
    assert len(cells) >= 5
    for i, src in enumerate(cells):
        compile(src, f"cell{i}", "exec")


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_package_symbols_exist(name):
    src = "\n".join(_code_cells(name))
    tree = ast.parse(src)
    aliases = {}  # local name -> imported object
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and \
                node.module.startswith("centroidal_mpc_tpu"):
            mod = importlib.import_module(node.module)
            for a in node.names:
                try:  # submodule import (empty package __init__s)
                    obj = importlib.import_module(
                        f"{node.module}.{a.name}")
                except ModuleNotFoundError:
                    obj = getattr(mod, a.name, None)
                assert obj is not None, \
                    f"{node.module}.{a.name} referenced by notebook missing"
                aliases[a.asname or a.name] = obj
    # every alias.attr(...) call target must exist
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute) and \
                isinstance(node.value, ast.Name) and \
                node.value.id in aliases:
            base = aliases[node.value.id]
            if isinstance(base, type(importlib)):  # module alias
                assert hasattr(base, node.attr), \
                    f"notebook calls {node.value.id}.{node.attr}, missing"


@pytest.mark.slow  # end-to-end kernel execution, ~minutes of XLA:CPU
# compile at N=18; the static checks above remain the fast net
def test_trot_notebook_executes_reduced_scale(tmp_path):
    """Execute demos/trot_demo.ipynb in a real Jupyter kernel at the
    reduced-scale preset (env-parameterized cells; VERDICT round 4,
    item 7).  Asserts the SCP cells report success in their outputs."""
    import nbformat
    from nbclient import NotebookClient

    nb = nbformat.read(DEMOS / "trot_demo.ipynb", as_version=4)
    env = dict(os.environ,
               CMPC_NB_FORCE_CPU="1",
               CMPC_NB_PRESET="solo12_trot_mini",
               CMPC_NB_OUTDIR=str(tmp_path))
    # kernels inherit the launching process environment
    old = {k: os.environ.get(k) for k in
           ("CMPC_NB_FORCE_CPU", "CMPC_NB_PRESET", "CMPC_NB_OUTDIR")}
    os.environ.update({k: env[k] for k in old})
    try:
        client = NotebookClient(nb, timeout=1800,
                                kernel_name="python3",
                                resources={"metadata":
                                           {"path": str(DEMOS)}})
        client.execute()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    text = "\n".join(
        "".join(o.get("text", "")) for c in nb.cells
        for o in c.get("outputs", []))
    assert "N=18 knots" in text
    assert "success=True" in text               # nominal SCP converged
    assert "stochastic: success=True" in text   # stochastic SCP too
    assert (tmp_path / "trot_nb" / "motion_preview.html").exists()
