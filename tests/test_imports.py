"""Every module in the package imports cleanly (catches bitrot in rarely
exercised corners like CLIs and optional backends)."""
import importlib
import pkgutil

import bilinear_tpu


def test_all_modules_import():
    failures = []
    for info in pkgutil.walk_packages(
        bilinear_tpu.__path__, prefix="bilinear_tpu."
    ):
        try:
            importlib.import_module(info.name)
        except Exception as e:  # pragma: no cover
            failures.append((info.name, repr(e)))
    assert not failures, failures
