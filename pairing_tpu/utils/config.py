"""Framework configuration (SURVEY.md §5: "small dataclass config").

The reference hardcodes its constants; the TPU build exposes the few knobs
that matter operationally. Limb geometry is compile-time (fields.fp
derives everything from RADIX_BITS/NLIMBS); this dataclass carries the
runtime choices.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class PairingConfig:
    """Runtime configuration for batched pairing execution."""

    #: 'pallas' | 'xla' | None (auto: pallas on TPU)
    backend: Optional[str] = None
    #: mesh shape for data parallelism (runner shards each chunk's batch
    #: axis over it), e.g. (8,) or (2, 4) for dcn x ici
    mesh_shape: Optional[Tuple[int, ...]] = None
    #: mesh axis names matching mesh_shape; the first axis carries the batch
    mesh_axes: Tuple[str, ...] = ("data",)
    #: chunk size for streaming huge batches through the device
    chunk_size: int = 8192
    #: optional directory for chunk checkpoints (resumable 1M+ runs)
    checkpoint_dir: Optional[str] = None

    def apply_backend(self) -> None:
        from ..ops import dispatch

        dispatch.force_backend(self.backend)
