"""Graph projection layer: (x0, y0) -> argmin ‖Ax−y0‖² + s‖x−x0‖²."""

from pogs_tpu.projector.direct import DirectProjector
from pogs_tpu.projector.indirect import CglsProjector

__all__ = ["DirectProjector", "CglsProjector"]
