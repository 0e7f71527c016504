"""Column selection, with grouped (multi-column) sub-selectors.

Mirrors the semantics of merlin-dag's ColumnSelector as used by the reference
operators (e.g. /root/reference/nvtabular/ops/categorify.py:350-365 uses
``col_selector.names`` / ``.subgroups`` / ``.grouped_names`` to distinguish
1-to-1 encodings from multi-column joint/combo groups).
"""

from __future__ import annotations


class ColumnSelector:
    """A list of column names, where an element may itself be a group.

    ``ColumnSelector(["a", "b", ["c", "d"]])`` selects columns a, b, c, d;
    ``grouped_names`` preserves the grouping: ``["a", "b", ("c", "d")]``.
    """

    def __init__(self, names=None):
        self._names: list[str] = []
        self.subgroups: list[ColumnSelector] = []
        if names is None:
            names = []
        if isinstance(names, str):
            names = [names]
        if isinstance(names, ColumnSelector):
            self._names = list(names._names)
            self.subgroups = list(names.subgroups)
            return
        for item in names:
            if isinstance(item, str):
                self._names.append(item)
            elif isinstance(item, (list, tuple)):
                self.subgroups.append(ColumnSelector(list(item)))
            elif isinstance(item, ColumnSelector):
                self.subgroups.append(item)
            else:
                raise TypeError(f"bad selector element: {item!r}")

    @property
    def names(self) -> list[str]:
        """All column names, flattened, order-preserving, de-duplicated."""
        out = list(self._names)
        for sub in self.subgroups:
            out.extend(sub.names)
        seen = set()
        uniq = []
        for n in out:
            if n not in seen:
                seen.add(n)
                uniq.append(n)
        return uniq

    @property
    def grouped_names(self) -> list:
        """Top-level names, with groups kept as tuples."""
        out: list = list(self._names)
        for sub in self.subgroups:
            out.append(tuple(sub.names))
        return out

    def __add__(self, other) -> "ColumnSelector":
        other = ColumnSelector(other)
        merged = ColumnSelector([])
        merged._names = list(self._names) + list(other._names)
        merged.subgroups = list(self.subgroups) + list(other.subgroups)
        return merged

    def __eq__(self, other):
        if not isinstance(other, ColumnSelector):
            return NotImplemented
        return self.grouped_names == other.grouped_names

    def __len__(self):
        return len(self.grouped_names)

    def __iter__(self):
        return iter(self.grouped_names)

    def __repr__(self):
        return f"ColumnSelector({self.grouped_names!r})"
