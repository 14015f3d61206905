"""Ephemeral scratch-directory placement for in-run temporaries.

Several operators create directories that live only inside one query run
and are deleted before (or shortly after) it returns: Structured
Streaming checkpoint dirs for drain-and-stop (Trigger.AvailableNow)
replays, and the snapshot-pipeline scratch corpus that
pipeline_snapshot_curation builds and rmtree's in its finally. Their I/O
is pure overhead — offsets/WAL/commit-log/state-snapshot files written,
fsynced and immediately discarded — and on a disk-backed /tmp it is the
dominant cost of every short stream run (guide §5/§6: the
Structured-Streaming per-run floor, VERDICT r15 task #1).

``scratch_root()`` picks where such directories go:

- ``$PYSPARKDB_SCRATCH`` when set — the deployment knob. Point it at fast
  local NVMe (or durable storage if you want post-mortem access to a
  failed run's checkpoint) on hosts where RAM is tight.
- otherwise a RAM-backed tmpfs (/dev/shm) when one is writable — the
  right default for scratch that is deleted within the run: these
  checkpoints exist to satisfy the streaming engine's WAL protocol
  during a single drain, not to survive a crash (a crashed run is simply
  re-run from the parquet inputs), so durability buys nothing and the
  fsync tax is pure waste. Sizing: the contents are offset/commit logs
  (KBs) plus state snapshots bounded by the stream's state — orders of
  magnitude below the corpus being processed.
- otherwise ``None`` → the platform default tempdir (tempfile's choice),
  the pre-round-16 behavior.

DURABLE streaming checkpoints — a production writeStream to a real sink
that must resume across restarts — must NOT come from here; callers own
those paths explicitly (see sources/versioned.snapshot_stream_sink's
checkpoint_dir parameter).
"""

from __future__ import annotations

import os


def scratch_root() -> str | None:
    """Directory under which ephemeral scratch dirs are created, or None
    for the platform default tempdir. See module docstring for policy."""
    env = os.environ.get("PYSPARKDB_SCRATCH")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return None
