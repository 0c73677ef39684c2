"""Export pipeline: PLY writeback with baked edits + mask filters, single or
multi-model ZIP.

Parity with reference `ExportModal` / `export_models` (`src/app.rs:591-978`):
- per-model {export, with-edit, with-mask} choices (`src/app.rs:659-751`)
- device buffer downloads of edits + masks (`src/app.rs:761-817`)
- single model -> bare .ply; multiple -> deflate ZIP of per-model PLYs
  (`src/app.rs:896-947`)
"""

from __future__ import annotations

import dataclasses
import io
import zipfile
from typing import BinaryIO, Dict

from ..data.ply import write_ply
from ..viewer.viewer import MultiModelViewer


@dataclasses.dataclass
class ExportChoice:
    """Per-model export selection (ref modal checkboxes, `src/app.rs:659-751`)."""

    export: bool = True
    with_edit: bool = True
    with_mask: bool = True


def export_models(
    viewer: MultiModelViewer,
    writer: BinaryIO,
    choices: Dict[str, ExportChoice] | None = None,
) -> list:
    """Export selected models; returns the list of exported names.

    One model -> raw PLY bytes; several -> ZIP (deflate) with one
    `<name>.ply` per model (ref `src/app.rs:904-945`).
    """
    choices = choices or {k: ExportChoice() for k in viewer.models}
    selected = [k for k, c in choices.items() if c.export and k in viewer.models]
    if not selected:
        return []

    def write_one(key: str, out: BinaryIO):
        m = viewer.models[key]
        c = choices[key]
        if m.gaussians is None:
            raise ValueError(f"model {key!r} has no CPU gaussians to export")
        edits = m.buffers.download_edits() if c.with_edit else None
        mask = m.buffers.download_mask() if c.with_mask else None
        write_ply(out, m.gaussians, edits=edits, mask=mask)

    if len(selected) == 1:
        write_one(selected[0], writer)
        return selected

    with zipfile.ZipFile(writer, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for key in selected:
            buf = io.BytesIO()
            write_one(key, buf)
            name = key if key.endswith(".ply") else f"{key}.ply"
            zf.writestr(name, buf.getvalue())
    return selected
