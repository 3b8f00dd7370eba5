"""Multi-host runtime initialization + serving mesh construction.

TPU-native analog of the reference's NCCL process-group setup
(``spin_quant/ptq.py:25`` ``dist.init_process_group(backend="nccl")``,
``full_main.py:713-718`` torchrun env init, SURVEY.md §5.8): one
``jax.distributed.initialize`` call connects the hosts, after which every
host sees the global device set and a single ``Mesh`` spans ICI(×DCN).
GSPMD inserts the collectives the reference issues by hand.

Environment-driven like torchrun: honors ``COORDINATOR_ADDRESS`` /
``NUM_PROCESSES`` / ``PROCESS_ID`` when args are not given (on Cloud TPU
pods ``jax.distributed.initialize()`` autodetects everything).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
from jax.sharding import Mesh

from .mesh import make_mesh

logger = logging.getLogger(__name__)

_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Connect this host to the multi-host JAX runtime. Returns process id.

    Single-process (no coordinator configured anywhere) is a no-op so the
    same entry works from one chip to a pod — mirroring how the reference
    CLIs run both with and without torchrun.
    """
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES"))
    if not _initialized and (coordinator_address or on_pod):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        _initialized = True
        logger.info("jax.distributed initialized: process %d/%d",
                    jax.process_index(), jax.process_count())
    return jax.process_index()


def serving_mesh(tp: Optional[int] = None, dp: int = 1,
                 n_devices: Optional[int] = None) -> Mesh:
    """Mesh for sharded decode: tensor-parallel over (all) devices, with an
    optional dp axis for batched serving. Call ``init_distributed`` first
    on multi-host."""
    n = n_devices or len(jax.devices())
    tp = tp or n // dp
    assert dp * tp == n, (dp, tp, n)
    return make_mesh(n, shape={"dp": dp, "fsdp": 1, "tp": tp})
