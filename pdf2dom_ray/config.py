"""Pipeline / parser configuration.

Mirrors the reference's config surface: ``PDFDomTreeConfig`` resource
handlers (`/root/reference/src/main/java/org/fit/pdfdom/PDFDomTreeConfig.java:27-74`)
and the ``PDFBoxTree`` flags (`PDFBoxTree.java:100-109`).
"""

from __future__ import annotations

from dataclasses import dataclass

# resource handler strategies (PDFDomTreeConfig.java:40-52)
EMBED_BASE64 = "embed_base64"
IGNORE = "ignore"
SAVE_TO_DIR = "save_to_dir"


@dataclass
class PdfDomConfig:
    disable_graphics: bool = False       # PDFBoxTree.java:101
    disable_images: bool = False         # PDFBoxTree.java:103
    disable_image_data: bool = False     # PDFBoxTree.java:105
    start_page: int = 0                  # PDFBoxTree.java:107 (init(): 0)
    end_page: int = 2**31 - 1            # PDFBoxTree.java:109
    font_handler: str = EMBED_BASE64     # PDFDomTreeConfig default
    image_handler: str = EMBED_BASE64
    # per-document wall-clock budget; exceeded → error row, never a hung worker
    timeout_s: float = 60.0
    # emit the spans side-output (list<struct> column)
    emit_spans: bool = True

    @property
    def skip_fonts(self) -> bool:
        # ignore-fonts fast path (PDFDomTree.java:456-462)
        return self.font_handler == IGNORE


DEFAULT_CONFIG = PdfDomConfig()
