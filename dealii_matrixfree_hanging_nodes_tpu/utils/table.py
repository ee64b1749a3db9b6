"""ConvergenceTable analog (capability C14; benchmark_01.cc:122-248)."""

from __future__ import annotations

import io

__all__ = ["ConvergenceTable"]


class ConvergenceTable:
    """Column-oriented results table with deal.II-style text output.

    add_value appends to a named column; rows are aligned by insertion order
    per column (like dealii::ConvergenceTable). set_scientific switches a
    column to exponent formatting. write_text pretty-prints aligned columns.
    """

    def __init__(self):
        self._columns: dict[str, list] = {}
        self._order: list[str] = []
        self._scientific: set[str] = set()
        self._precision: dict[str, int] = {}

    def add_value(self, key: str, value):
        if key not in self._columns:
            self._columns[key] = []
            self._order.append(key)
        self._columns[key].append(value)

    def set_scientific(self, key: str, flag: bool = True):
        if flag:
            self._scientific.add(key)
        else:
            self._scientific.discard(key)

    def set_precision(self, key: str, digits: int):
        self._precision[key] = digits

    def _fmt(self, key, v):
        if isinstance(v, float):
            if key in self._scientific:
                return f"{v:.{self._precision.get(key, 4)}e}"
            return f"{v:.{self._precision.get(key, 4)}g}"
        return str(v)

    def n_rows(self) -> int:
        return max((len(c) for c in self._columns.values()), default=0)

    def rows(self) -> list[dict]:
        out = []
        for i in range(self.n_rows()):
            out.append(
                {k: (self._columns[k][i] if i < len(self._columns[k]) else None)
                 for k in self._order}
            )
        return out

    def write_text(self, stream=None) -> str:
        buf = io.StringIO()
        cols = self._order
        cells = [
            [self._fmt(k, c) if c is not None else "" for c in self._columns[k]]
            for k in cols
        ]
        widths = [max(len(k), max((len(x) for x in col), default=0))
                  for k, col in zip(cols, cells)]
        buf.write(" ".join(k.rjust(w) for k, w in zip(cols, widths)) + "\n")
        for i in range(self.n_rows()):
            row = [
                (cells[j][i] if i < len(cells[j]) else "").rjust(widths[j])
                for j in range(len(cols))
            ]
            buf.write(" ".join(row) + "\n")
        text = buf.getvalue()
        if stream is not None:
            stream.write(text)
        return text

    def write_csv(self, stream) -> None:
        cols = self._order
        stream.write(",".join(cols) + "\n")
        for i in range(self.n_rows()):
            stream.write(
                ",".join(
                    str(self._columns[k][i]) if i < len(self._columns[k]) else ""
                    for k in cols
                )
                + "\n"
            )
