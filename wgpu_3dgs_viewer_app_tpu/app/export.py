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


def snapshot_exports(
    viewer: MultiModelViewer,
    choices: Dict[str, ExportChoice] | None = None,
) -> list:
    """Stage 1 (call UNDER the session lock — cheap): capture per-model
    (name, gaussians, edits, mask) tuples. Downloads the small edit/mask
    device buffers; the Gaussians arrays are immutable CPU copies, so a
    reference suffices. Serialization happens off-lock in
    `serialize_exports` (a 6M-splat PLY write is hundreds of MB and must
    not block /state — same fix class as the server's frame gate)."""
    choices = choices or {k: ExportChoice() for k in viewer.models}
    snap = []
    for key, c in choices.items():
        if not (c.export and key in viewer.models):
            continue
        m = viewer.models[key]
        if m.gaussians is None:
            raise ValueError(f"model {key!r} has no CPU gaussians to export")
        edits = m.buffers.download_edits() if c.with_edit else None
        mask = m.buffers.download_mask() if c.with_mask else None
        snap.append((key, m.gaussians, edits, mask))
    return snap


def serialize_exports(snap: list, writer: BinaryIO) -> list:
    """Stage 2 (call OUTSIDE the lock): PLY/ZIP serialization of a
    `snapshot_exports` capture. One model -> raw PLY bytes; several -> ZIP
    (deflate) with one `<name>.ply` per model (ref `src/app.rs:904-945`)."""
    if not snap:
        return []
    if len(snap) == 1:
        key, g, edits, mask = snap[0]
        write_ply(writer, g, edits=edits, mask=mask)
        return [key]
    with zipfile.ZipFile(writer, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for key, g, edits, mask in snap:
            buf = io.BytesIO()
            write_ply(buf, g, edits=edits, mask=mask)
            name = key if key.endswith(".ply") else f"{key}.ply"
            zf.writestr(name, buf.getvalue())
    return [s[0] for s in snap]


def export_models(
    viewer: MultiModelViewer,
    writer: BinaryIO,
    choices: Dict[str, ExportChoice] | None = None,
) -> list:
    """Export selected models; returns the list of exported names.
    Convenience single-call form of `snapshot_exports` + `serialize_exports`
    (ref `export_models`, `src/app.rs:896-947`)."""
    return serialize_exports(snapshot_exports(viewer, choices), writer)
