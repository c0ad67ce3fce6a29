"""The tutorial notebooks (Notebook/, mirroring the reference's Colab
notebooks) actually run: every code cell is executed in order in one
namespace per notebook."""
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB_DIR = os.path.join(REPO, "Notebook")


@pytest.mark.parametrize("name", [
    "kgcn_tpu_solpred.ipynb",
    "kgcn_tpu_linkpred.ipynb",
])
def test_notebook_executes(name, tmp_path, monkeypatch):
    path = os.path.join(NB_DIR, name)
    assert os.path.exists(path), "run Notebook/build_notebooks.py"
    monkeypatch.chdir(tmp_path)  # model dirs land in tmp
    nb = json.load(open(path))
    ns = {}
    for i, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        try:
            exec(compile(src, f"{name}[cell {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"{name} cell {i} failed: {e}\n{src}") from e


def test_notebooks_in_sync_with_generator():
    """The committed .ipynb files match build_notebooks.py exactly."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "build_notebooks", os.path.join(NB_DIR, "build_notebooks.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name, cells in (("kgcn_tpu_solpred.ipynb", mod.SOLPRED_CELLS),
                        ("kgcn_tpu_linkpred.ipynb", mod.LINKPRED_CELLS)):
        want = mod.build(cells)
        got = json.load(open(os.path.join(NB_DIR, name)))
        assert got == want, f"{name} out of sync — rerun build_notebooks.py"
