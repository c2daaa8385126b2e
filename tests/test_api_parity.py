"""
Machine-checked API parity: every public module-level symbol of the
reference package (functions, classes, and UPPERCASE constants parsed
straight out of its source with ast — nothing is imported or executed
from it) must have a same-name counterpart in the corresponding
pyshepseg_tpu module. This pins the drop-in-replacement guarantee that
PARITY.md documents table-by-table.

Skipped when the reference checkout is not present (e.g. CI).
"""

import ast
import importlib
import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference/pyshepseg")

# Reference modules with a same-name counterpart here. cmdline scripts
# are covered by test_cmdline.py; guardeddecorators is numba-specific
# by design (see PARITY.md).
MODULES = ["shepseg", "tiling", "tilingstats", "subset", "utils",
           "timinghooks"]


def referencePublicSymbols(modName):
    tree = ast.parse((REFERENCE_DIR / f"{modName}.py").read_text())
    names = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            if not node.name.startswith("_"):
                names.append(node.name)
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if (isinstance(tgt, ast.Name) and
                        not tgt.id.startswith("_") and tgt.id.isupper()):
                    names.append(tgt.id)
    return names


@pytest.mark.skipif(not REFERENCE_DIR.is_dir(),
                    reason="reference checkout not available")
@pytest.mark.parametrize("modName", MODULES)
def test_every_reference_public_symbol_exists(modName):
    names = referencePublicSymbols(modName)
    assert names, f"parsed no public symbols from reference {modName}"
    mod = importlib.import_module(f"pyshepseg_tpu.{modName}")
    missing = [n for n in names if not hasattr(mod, n)]
    assert not missing, (
        f"pyshepseg_tpu.{modName} lacks reference symbols: {missing}")
