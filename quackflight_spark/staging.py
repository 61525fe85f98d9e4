"""Session-scoped staging roots for derived /tmp data.

Every operator that stages derived fixtures (bucketed tables, schema-
evolution generations, time-travel manifests, merge targets, stream
sinks) writes under /tmp, keyed by a content fingerprint so one session
builds each stage once. Until r8 those roots were SHARED across
processes, and two concurrent sessions (the r7 judge's harness run vs
the builder's pytest) could overwrite a stage mid-read
(FAILED_READ_FILE.FILE_NOT_EXIST on /tmp/qf_bucketed — passes in
isolation). The roots are now keyed by the driver process id: in-process
reuse is untouched (bench, the driver gate and pytest are each one
process, which is where the fingerprint cache pays), and cross-process
interference is structurally impossible. /tmp is ephemeral — stale
per-pid dirs cost disk only for the container's lifetime.
"""

from __future__ import annotations

import os


def stage_root(name: str) -> str:
    """Per-process staging root for one staging family."""
    return f"/tmp/qf_{name}_p{os.getpid()}"
