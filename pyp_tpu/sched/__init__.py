"""Orchestration: split/swarm/merge job graphs and executors."""

from pyp_tpu.sched.graph import Job, JobGraph  # noqa: F401
from pyp_tpu.sched.executor import LocalExecutor, SlurmExecutor  # noqa: F401
