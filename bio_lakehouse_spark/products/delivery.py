"""S17 report delivery: HTML file sink + PDF rendering seam.

Parity target: the reference's delivery layer (ref
insights_engine/reports/delivery.py:17-66) saves the weekly HTML,
converts it to PDF via an HTML-to-PDF engine (WeasyPrint there), and
uploads to object storage. Here:

* ``save_html`` — local file sink (the object-store upload is a
  deployment concern: same bytes, different client).
* ``save_pdf`` / ``pdf_bytes`` — PDF conversion behind a PLUGGABLE
  renderer (the nl_sql LLMFn / textops TokenCounterFn pattern): a
  ``PdfRendererFn`` maps HTML string → PDF bytes. The default
  resolver tries WeasyPrint, which is not installed in this sandbox —
  callers inject their renderer (one line for weasyprint:
  ``lambda h: HTML(string=h).write_pdf()``), tests inject a fake.
  With neither, ``save_pdf`` raises ``PdfUnavailableError`` loudly —
  never a silent HTML-only degrade.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

PdfRendererFn = Callable[[str], bytes]


class PdfUnavailableError(RuntimeError):
    """No PDF renderer: none injected and WeasyPrint not importable."""


def default_pdf_renderer() -> PdfRendererFn | None:
    """WeasyPrint adapter when the library is present, else None."""
    try:
        from weasyprint import HTML  # not in this sandbox
    except ImportError:
        return None

    def render(html: str) -> bytes:
        return HTML(string=html).write_pdf()

    return render


def pdf_bytes(html: str, renderer: PdfRendererFn | None = None) -> bytes:
    """HTML → PDF bytes via the injected renderer (or WeasyPrint)."""
    render = renderer or default_pdf_renderer()
    if render is None:
        raise PdfUnavailableError(
            "no PDF renderer: pass renderer= (e.g. a weasyprint "
            "adapter) or install weasyprint"
        )
    out = render(html)
    if not isinstance(out, (bytes, bytearray)):
        raise TypeError(
            f"PDF renderer must return bytes, got {type(out).__name__}"
        )
    return bytes(out)


def save_pdf(
    html: str,
    path: str | Path,
    renderer: PdfRendererFn | None = None,
) -> Path:
    """Render and write the weekly report PDF. Returns the path."""
    out = Path(path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(pdf_bytes(html, renderer))
    return out


def save_html(html: str, path: str | Path) -> Path:
    """Write the weekly report HTML. Returns the path."""
    out = Path(path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(html, encoding="utf-8")
    return out


def deliver_weekly(
    html: str,
    out_dir: str | Path,
    week_label: str,
    renderer: PdfRendererFn | None = None,
) -> dict[str, str | None]:
    """Full delivery: HTML always; PDF when a renderer is available
    (injected or WeasyPrint). Returns {"html": path, "pdf": path or
    None} — pdf None ONLY for the genuinely-no-renderer case; a
    renderer that fails raises."""
    root = Path(out_dir) / week_label
    html_path = save_html(html, root / "weekly-report.html")
    render = renderer or default_pdf_renderer()
    pdf_path = (
        str(save_pdf(html, root / "weekly-report.pdf", render))
        if render is not None
        else None
    )
    return {"html": str(html_path), "pdf": pdf_path}
