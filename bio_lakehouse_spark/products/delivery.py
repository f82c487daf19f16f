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
  resolver tries WeasyPrint (full CSS layout), falling back to the
  built-in ``mini_pdf_renderer`` (r7) — a dependency-free PDF 1.4
  text writer, so a valid PDF ALWAYS ships; callers wanting richer
  layout inject their renderer (one line for weasyprint:
  ``lambda h: HTML(string=h).write_pdf()``).
  ``PdfUnavailableError`` remains for callers that bypass the
  default ladder and end up renderer-less.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

PdfRendererFn = Callable[[str], bytes]


class PdfUnavailableError(RuntimeError):
    """No PDF renderer: none injected and WeasyPrint not importable."""


def default_pdf_renderer() -> PdfRendererFn:
    """Renderer resolution ladder: WeasyPrint (full CSS) when the
    library is present, else the built-in ``mini_pdf_renderer`` —
    since r7 a renderer is ALWAYS available, so the weekly PDF always
    lands (previously this returned None in sandboxes without
    WeasyPrint and delivery degraded to HTML-only)."""
    try:
        from weasyprint import HTML  # not in this sandbox
    except ImportError:
        return mini_pdf_renderer

    def render(html: str) -> bytes:
        return HTML(string=html).write_pdf()

    return render


def _html_to_lines(html: str, width: int = 94) -> list[str]:
    """Crude-but-honest HTML → text lines: drop style/script bodies,
    map structural tags to line breaks, strip the rest, unescape
    entities, wrap long lines."""
    import html as _htmlmod
    import re
    import textwrap

    s = re.sub(r"(?is)<(style|script)\b.*?</\1>", "", html)
    s = re.sub(r"(?i)<(br|/p|/h[1-6]|/tr|/li|/div|/table)\b[^>]*>", "\n", s)
    s = re.sub(r"(?is)<[^>]+>", "", s)
    s = _htmlmod.unescape(s)
    lines: list[str] = []
    for raw in s.splitlines():
        raw = raw.strip()
        if not raw:
            if lines and lines[-1] != "":
                lines.append("")
            continue
        lines.extend(textwrap.wrap(raw, width=width) or [""])
    while lines and lines[-1] == "":
        lines.pop()
    return lines or [""]


def mini_pdf_renderer(html: str) -> bytes:
    """Dependency-free PDF 1.4 writer — a REAL renderer (valid
    cross-reference table, Helvetica text pages any viewer opens),
    not a stub: the report's text content paginated at 54 lines/page.
    Layout fidelity (CSS, tables, charts) is WeasyPrint's job when
    installed; this guarantees the delivery contract — a PDF always
    ships — in environments without it. Ref parity:
    insights_engine/reports/delivery.py:17-66 (HTML→PDF→store)."""
    lines = _html_to_lines(html)
    per_page = 54
    pages = [lines[i : i + per_page] for i in range(0, len(lines), per_page)]

    def esc(s: str) -> bytes:
        b = s.encode("latin-1", errors="replace")
        return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(
            b")", b"\\)"
        )

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages-tree, 3 font, then per page
    # i: 4+2i = page object, 5+2i = its content stream
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, page in enumerate(pages):
        objs[4 + 2 * i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>".encode()
        )
        body = b"BT /F1 10 Tf 12 TL 50 770 Td\n"
        for j, line in enumerate(page):
            body += (b"(" + esc(line) + b") Tj T*\n")
        body += b"ET"
        objs[5 + 2 * i] = (
            f"<< /Length {len(body)} >>\nstream\n".encode()
            + body
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = max(objs) + 1
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


def pdf_bytes(
    html: str, renderer: PdfRendererFn | None | bool = None
) -> bytes:
    """HTML → PDF bytes. ``renderer=None`` uses the default ladder
    (WeasyPrint → built-in mini renderer — always succeeds);
    ``renderer=False`` DEMANDS a full-layout engine: WeasyPrint or
    ``PdfUnavailableError``, never the text fallback."""
    if renderer is False:
        try:
            from weasyprint import HTML
        except ImportError:
            raise PdfUnavailableError(
                "full-layout PDF demanded (renderer=False) but "
                "weasyprint is not installed"
            ) from None

        def render(h: str) -> bytes:
            return HTML(string=h).write_pdf()
    else:
        render = renderer or default_pdf_renderer()
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
    """Full delivery: HTML always; PDF via the injected renderer or
    the default ladder (WeasyPrint → built-in mini renderer), so
    since r7 the pdf key is always a path in practice; a renderer
    that fails raises rather than degrading."""
    root = Path(out_dir) / week_label
    html_path = save_html(html, root / "weekly-report.html")
    render = renderer or default_pdf_renderer()
    pdf_path = (
        str(save_pdf(html, root / "weekly-report.pdf", render))
        if render is not None
        else None
    )
    return {"html": str(html_path), "pdf": pdf_path}
