"""HTML/string formatting for DataFrame display (reference:
python/datafusion/dataframe_formatter.py).

A functional, dependency-free re-implementation over pyarrow batches:
``DataFrameHtmlFormatter`` renders the same API surface (cell-formatter
registry, custom cell/header builders, style providers, row/memory
truncation) and the module-level ``get_formatter`` / ``set_formatter`` /
``configure_formatter`` / ``reset_formatter`` management functions.
"""

from __future__ import annotations

import html as _html
from typing import Any, Callable

__all__ = [
    "DataFrameHtmlFormatter",
    "DefaultStyleProvider",
    "configure_formatter",
    "get_formatter",
    "reset_formatter",
    "set_formatter",
]


class DefaultStyleProvider:
    """Default CSS fragments for table cells and headers."""

    def get_cell_style(self) -> str:
        return (
            "border: 1px solid #ddd; padding: 6px; text-align: left; "
            "white-space: nowrap;"
        )

    def get_header_style(self) -> str:
        return (
            "border: 1px solid #ddd; padding: 6px; text-align: left; "
            "background-color: #f5f5f5; position: sticky; top: 0;"
        )


def _datafusion_render(value: Any) -> str:
    """Arrow-style cell text (DataFusion's pretty printer): structs as
    ``{a: 1, b: x}``, lists as ``[1, 2]``, bare strings unquoted."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, dict):
        return "{" + ", ".join(
            f"{k}: {_datafusion_render(v)}" for k, v in value.items()
        ) + "}"
    if isinstance(value, (list, tuple)):
        return "[" + ", ".join(_datafusion_render(v) for v in value) + "]"
    return str(value)


def _require_positive(value: Any, name: str) -> None:
    if not isinstance(value, int) or isinstance(value, bool) or value <= 0:
        raise ValueError(f"{name} must be a positive integer, got {value!r}")


def _require_bool(value: Any, name: str) -> None:
    if not isinstance(value, bool):
        raise TypeError(f"{name} must be a boolean, got {value!r}")


class DataFrameHtmlFormatter:
    """Format Arrow record batches as HTML tables or plain text (ref
    dataframe_formatter.py:201). Rendering truncates by row count and
    by rendered-byte budget, with per-type formatter overrides and
    custom cell/header builder hooks."""

    def __init__(
        self,
        max_cell_length: int = 25,
        max_width: int = 1000,
        max_height: int = 300,
        max_memory_bytes: int = 2 * 1024 * 1024,
        min_rows: int | None = None,
        max_rows: int | None = None,
        repr_rows: int | None = None,
        enable_cell_expansion: bool = True,
        custom_css: str | None = None,
        show_truncation_message: bool = True,
        style_provider: Any | None = None,
        use_shared_styles: bool = True,
    ) -> None:
        for v, n in [
            (max_cell_length, "max_cell_length"),
            (max_width, "max_width"),
            (max_height, "max_height"),
            (max_memory_bytes, "max_memory_bytes"),
        ]:
            _require_positive(v, n)
        if repr_rows is not None:
            import warnings

            warnings.warn(
                "repr_rows parameter is deprecated; use max_rows instead",
                DeprecationWarning,
                stacklevel=2,
            )
            if max_rows is not None:
                raise ValueError("Cannot specify both repr_rows and max_rows")
        resolved = max_rows if max_rows is not None else (repr_rows or 20)
        _require_positive(resolved, "max_rows")
        if min_rows is None:
            min_rows = min(10, resolved)  # default floor, never above max
        _require_positive(min_rows, "min_rows")
        if min_rows > resolved:
            raise ValueError("min_rows must be less than or equal to max_rows")
        for v, n in [
            (enable_cell_expansion, "enable_cell_expansion"),
            (show_truncation_message, "show_truncation_message"),
            (use_shared_styles, "use_shared_styles"),
        ]:
            _require_bool(v, n)
        if custom_css is not None and not isinstance(custom_css, str):
            raise TypeError("custom_css must be a string")
        if style_provider is not None and not (
            hasattr(style_provider, "get_cell_style")
            and hasattr(style_provider, "get_header_style")
        ):
            raise TypeError("style_provider must implement StyleProvider")

        self.max_cell_length = max_cell_length
        self.max_width = max_width
        self.max_height = max_height
        self.max_memory_bytes = max_memory_bytes
        self.min_rows = min_rows
        self._max_rows = resolved
        self.enable_cell_expansion = enable_cell_expansion
        self.custom_css = custom_css
        self.show_truncation_message = show_truncation_message
        self.style_provider = style_provider or DefaultStyleProvider()
        self.use_shared_styles = use_shared_styles
        self._type_formatters: dict[type, Callable[[Any], str]] = {}
        self._custom_cell_builder: Callable[[Any, int, int, str], str] | None = None
        self._custom_header_builder: Callable[[Any], str] | None = None

    # -- properties (ref max_rows / repr_rows alias) ---------------------------
    @property
    def max_rows(self) -> int:
        return self._max_rows

    @max_rows.setter
    def max_rows(self, value: int) -> None:
        _require_positive(value, "max_rows")
        self._max_rows = value

    @property
    def repr_rows(self) -> int:
        return self._max_rows

    @repr_rows.setter
    def repr_rows(self, value: int) -> None:
        import warnings

        warnings.warn(
            "repr_rows is deprecated; use max_rows instead",
            DeprecationWarning,
            stacklevel=2,
        )
        self.max_rows = value

    # -- customization hooks ---------------------------------------------------
    def register_formatter(self, type_class: type, formatter: Callable[[Any], str]) -> None:
        """Custom stringifier for values of ``type_class``."""
        self._type_formatters[type_class] = formatter

    def set_custom_cell_builder(self, builder: Callable[[Any, int, int, str], str]) -> None:
        """builder(value, row, col, table_uuid) -> full ``<td>`` html."""
        self._custom_cell_builder = builder

    def set_custom_header_builder(self, builder: Callable[[Any], str]) -> None:
        """builder(field) -> full ``<th>`` html."""
        self._custom_header_builder = builder

    # -- value rendering -------------------------------------------------------
    def _format_value(self, value: Any, truncate: bool = True) -> tuple[str, bool]:
        """(rendered text, is_raw_html) — custom type formatters emit raw
        HTML (the reference inserts their output unescaped). Plain-text
        rendering (format_str) keeps full cell text."""
        for t, fmt in self._type_formatters.items():
            if isinstance(value, t):
                return fmt(value), True
        s = _datafusion_render(value)
        if truncate and len(s) > self.max_cell_length:
            s = s[: self.max_cell_length] + "…"
        return s, False

    def _rows(self, batches: list) -> tuple[list[list[Any]], bool]:
        """Collect rows up to max_rows and the rendered-HTML byte budget
        (estimated per cell incl. markup) — the stream stops early, it
        does not materialize everything and then truncate."""
        rows: list[list[Any]] = []
        rendered = 0
        overhead = 60 + len(self.style_provider.get_cell_style())
        for batch in batches:
            for row in batch.to_pylist():
                vals = list(row.values())
                rendered += sum(len(str(v)) + overhead for v in vals)
                rows.append(vals)
                if len(rows) >= self._max_rows or (
                    rendered > self.max_memory_bytes and len(rows) >= self.min_rows
                ):
                    return rows, True
        return rows, False

    _BASE_CSS = ".df-table td, .df-table th { font-family: monospace; }"
    _EXPANSION_CSS = " .expandable .full-text { display: none; }"

    def _style_script(self) -> str:
        """Stylesheet injection via a ``<script>`` that installs (or, for
        shared styles, reuses) a ``df-styles`` style element — keeping a
        literal ``<style>`` tag out of every table's HTML (ref
        dataframe_formatter.py shared-styles behavior)."""
        import json as _json

        css = self._BASE_CSS
        if self.enable_cell_expansion:
            css += self._EXPANSION_CSS
        if self.custom_css:
            css += " " + self.custom_css
        payload = _json.dumps(css)
        if self.use_shared_styles:
            body = (
                "if (!document.getElementById('df-styles')) {"
                "var s = document.createElement('style');"
                "s.id = 'df-styles';"
                f"s.textContent = {payload};"
                "document.head.appendChild(s);}"
            )
        else:
            body = (
                "var e = document.getElementById('df-styles');"
                "if (e) e.remove();"
                "var s = document.createElement('style');"
                "s.id = 'df-styles';"
                f"s.textContent = {payload};"
                "document.head.appendChild(s);"
            )
        return f"<script>{body}</script>"

    # -- output ---------------------------------------------------------------
    def format_html(
        self,
        batches: list,
        schema: Any,
        has_more: bool = False,
        table_uuid: str | None = None,
    ) -> str:
        """Render batches as an HTML table (ref format_html)."""
        if not batches:
            return "No data to display"
        if schema is None or not hasattr(schema, "__iter__"):
            raise TypeError("Schema must be provided")
        table_uuid = table_uuid or f"df-{id(batches)}"
        rows, truncated = self._rows(batches)

        out = []
        out.append(self._style_script())
        out.append(
            f'<div style="max-width: {self.max_width}px; max-height: '
            f'{self.max_height}px; overflow: auto;">'
        )
        out.append(f'<table id="{table_uuid}" style="border-collapse: collapse;">')
        out.append("<thead><tr>")
        hs = self.style_provider.get_header_style()
        for field in schema:
            if self._custom_header_builder is not None:
                out.append(self._custom_header_builder(field))
            else:
                out.append(f'<th style="{hs}">{_html.escape(str(field.name))}</th>')
        out.append("</tr></thead>")
        out.append("<tbody>")
        cs = self.style_provider.get_cell_style()
        for r, vals in enumerate(rows):
            out.append("<tr>")
            for c, v in enumerate(vals):
                if self._custom_cell_builder is not None:
                    out.append(self._custom_cell_builder(v, r, c, table_uuid))
                else:
                    text, raw = self._format_value(v)
                    out.append(
                        f'<td style="{cs}">{text if raw else _html.escape(text)}</td>'
                    )
            out.append("</tr>")
        out.append("</tbody></table></div>")
        if (has_more or truncated) and self.show_truncation_message:
            out.append("<div>Data truncated due to size.</div>")
        return "\n".join(out)

    def format_str(
        self,
        batches: list,
        schema: Any,
        has_more: bool = False,
        table_uuid: str | None = None,
    ) -> str:
        """Render batches as an aligned plain-text table (ref format_str)."""
        if not batches:
            return "No data to display"
        rows, truncated = self._rows(batches)
        names = [str(f.name) for f in schema]
        cells = [[self._format_value(v, truncate=False)[0] for v in vals] for vals in rows]
        widths = [
            max(len(names[i]), *(len(r[i]) for r in cells)) if cells else len(names[i])
            for i in range(len(names))
        ]
        sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
        def line(vals):
            return "| " + " | ".join(v.ljust(w) for v, w in zip(vals, widths)) + " |"
        out = [sep, line(names), sep]
        out.extend(line(r) for r in cells)
        out.append(sep)
        if (has_more or truncated) and self.show_truncation_message:
            out.append("Data truncated due to size.")
        return "\n".join(out)


_default_formatter = DataFrameHtmlFormatter()


def get_formatter() -> DataFrameHtmlFormatter:
    """The active formatter instance (ref get_formatter)."""
    return _default_formatter


def set_formatter(formatter: DataFrameHtmlFormatter) -> None:
    """Install ``formatter`` as the active instance (ref set_formatter)."""
    global _default_formatter
    if not isinstance(formatter, DataFrameHtmlFormatter):
        raise TypeError("formatter must be a DataFrameHtmlFormatter")
    _default_formatter = formatter


def configure_formatter(**kwargs: Any) -> None:
    """Replace the active formatter with one built from ``kwargs`` (ref
    configure_formatter); unknown parameters raise ValueError."""
    import inspect

    valid = set(inspect.signature(DataFrameHtmlFormatter.__init__).parameters) - {
        "self"
    }
    unknown = sorted(set(kwargs) - valid)
    if unknown:
        raise ValueError(
            f"Invalid formatter parameters: {', '.join(unknown)}. "
            f"Valid parameters are: {', '.join(sorted(valid))}"
        )
    set_formatter(DataFrameHtmlFormatter(**kwargs))


def reset_formatter() -> None:
    """Restore the default-configured formatter (ref reset_formatter)."""
    set_formatter(DataFrameHtmlFormatter())
