"""Shared test infrastructure.

Provides
  * ``spark`` — one session-scoped local SparkSession.
  * ``reference`` — the reference implementation imported from
    /root/reference as a *differential-test oracle* (skipped when absent).
    The reference has optional deps not present in this environment
    (wasabi/typer/sklearn/more_itertools/boltons); light stand-in modules are
    injected so its pure semantic core imports cleanly.  No reference code is
    copied — it is executed in-process purely to compare outputs.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types
from pathlib import Path

import pytest

REFERENCE_ROOT = Path("/root/reference")


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _install_reference_dep_stubs() -> None:
    if "wasabi" not in sys.modules:
        wasabi = _stub_module("wasabi")

        class _Printer:  # noqa: D401 - minimal stand-in
            def __init__(self, *a, **k):
                pass

            def __getattr__(self, name):
                def _noop(*a, **k):
                    class _Ctx:
                        def __enter__(self):
                            return self

                        def __exit__(self, *exc):
                            return False

                    return _Ctx()

                return _noop

        wasabi.Printer = _Printer
        sys.modules["wasabi"] = wasabi

    if "typer" not in sys.modules:
        typer = _stub_module("typer")

        class _Typer:
            def __init__(self, *a, **k):
                pass

            def command(self, *a, **k):
                def deco(fn):
                    return fn

                return deco

        def _passthrough(default=None, *a, **k):
            return default

        typer.Typer = _Typer
        typer.Argument = _passthrough
        typer.Option = _passthrough
        sys.modules["typer"] = typer
        testing = _stub_module("typer.testing")

        class _CliRunner:
            pass

        testing.CliRunner = _CliRunner
        sys.modules["typer.testing"] = testing

    if "more_itertools" not in sys.modules:
        mit = _stub_module("more_itertools")

        def chunked(iterable, n):
            buf = []
            for item in iterable:
                buf.append(item)
                if len(buf) == n:
                    yield buf
                    buf = []
            if buf:
                yield buf

        mit.chunked = chunked
        sys.modules["more_itertools"] = mit

    if "sklearn" not in sys.modules:
        skl = _stub_module("sklearn")
        model_selection = _stub_module("sklearn.model_selection")

        def train_test_split(data, test_size=None, **kwargs):
            n = len(data)
            n_test = int(round(n * test_size)) if isinstance(test_size, float) else int(test_size)
            return data[: n - n_test], data[n - n_test :]

        model_selection.train_test_split = train_test_split
        skl.model_selection = model_selection
        sys.modules["sklearn"] = skl
        sys.modules["sklearn.model_selection"] = model_selection

    if "boltons" not in sys.modules:
        boltons = _stub_module("boltons")
        jsonutils = _stub_module("boltons.jsonutils")

        def JSONLIterator(fh):
            import json

            for line in fh:
                line = line.strip()
                if line:
                    yield json.loads(line)

        jsonutils.JSONLIterator = JSONLIterator
        boltons.jsonutils = jsonutils
        sys.modules["boltons"] = boltons
        sys.modules["boltons.jsonutils"] = jsonutils


@pytest.fixture(scope="session")
def reference():
    """Import the reference package as an oracle, or skip."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not available")
    _install_reference_dep_stubs()
    sys.path.insert(0, str(REFERENCE_ROOT))
    import seq2rel_ds.common.util as ref_util  # noqa: F401
    import seq2rel_ds.common.schemas as ref_schemas  # noqa: F401

    ns = types.SimpleNamespace(util=ref_util, schemas=ref_schemas)
    try:
        import seq2rel_ds.cdr as ref_cdr

        ns.cdr = ref_cdr
    except Exception:
        ns.cdr = None
    return ns


@pytest.fixture(scope="session")
def spark():
    from seq2rel_ds_spark.session import get_spark

    spark = get_spark(app_name="seq2rel-ds-spark-tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()
