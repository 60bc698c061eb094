"""Process-scoped scratch directories for staging queries.

Queries that stage files (streaming sources, versioned swap targets,
sink round-trips) allocate scratch dirs that must OUTLIVE the returned
DataFrame — the driver/tests collect AFTER the query function returns,
so a try/finally rmtree inside the query would delete the inputs of a
still-lazy plan. Instead every scratch dir registers for
interpreter-exit cleanup: repeated bench/parity runs no longer
accumulate per-run parquet/XML staging garbage in /tmp (ADVICE r03 on
xml_roundtrip and the TWS timer staging), and nothing is removed while
any plan in this process could still read it.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    for d in _DIRS:
        shutil.rmtree(d, ignore_errors=True)
