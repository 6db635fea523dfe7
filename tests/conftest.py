from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

_REPO = str(Path(__file__).resolve().parents[1])
_TESTS = str(Path(__file__).resolve().parent)
sys.path.insert(0, _REPO)
# executor Python workers are separate processes: they need the repo AND the
# tests dir importable to unpickle closures defined in test modules
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_REPO, _TESTS, os.environ.get("PYTHONPATH", "")]
).rstrip(os.pathsep)

from kafka_connect_ftp_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests")
