"""Operator DAG built with the ``>>`` / ``+`` DSL.

Mirrors the reference's WorkflowNode graph semantics
(/root/reference/nvtabular/workflow/workflow.py:54-57; node DSL exercised at
/root/reference/tests/unit/test_dask_nvt.py:92-98) without merlin-dag: a Node
is either a column selection over the root table, an operator applied to its
parents' outputs, or an addition (column concat) of several branches.
"""

from __future__ import annotations

from typing import Optional

from nvtabular_ray.ops.base import Operator
from nvtabular_ray.selector import ColumnSelector


class Node:
    def __init__(
        self,
        selector: Optional[ColumnSelector] = None,
        op: Optional[Operator] = None,
        parents: Optional[list["Node"]] = None,
        kind: str = "op",
    ):
        self.selector = selector
        self.op = op
        self.parents: list[Node] = parents or []
        self.kind = kind  # "selection" | "op" | "addition"
        self.name: Optional[str] = None  # subgraph handle (see alias())

    def alias(self, name: str) -> "Node":
        """Name this node as a reusable subgraph: ``Workflow.get_subworkflow``
        extracts it (sharing the fitted op instances) so a branch — e.g. the
        categorical tower — can run standalone for serving. Reference:
        get_subworkflow / Subgraph, workflow.py:168-170."""
        self.name = name
        return self

    # -------------------------------------------------------------- DSL --
    @staticmethod
    def from_selection(obj) -> "Node":
        if isinstance(obj, Node):
            return obj
        return Node(selector=ColumnSelector(obj), kind="selection")

    def __rshift__(self, op: Operator) -> "Node":
        if callable(op) and not isinstance(op, Operator):
            from nvtabular_ray.ops.simple import LambdaOp

            op = LambdaOp(op)
        if not isinstance(op, Operator):
            raise TypeError(f"right side of >> must be an Operator, got {op!r}")
        return Node(op=op, parents=[self], kind="op")

    def __add__(self, other) -> "Node":
        other = Node.from_selection(other)
        return Node(parents=[self, other], kind="addition")

    def __radd__(self, other) -> "Node":
        # `['tag'] + node`: the LEFT operand's columns must come first —
        # aliasing __add__ here reversed branch order, changing both output
        # column order and which branch wins a duplicate-name dedup
        other = Node.from_selection(other)
        return Node(parents=[other, self], kind="addition")

    def __getitem__(self, cols) -> "Node":
        """Sub-select columns of this node's output (reference node slicing)."""
        child = Node(selector=ColumnSelector(cols), parents=[self], kind="selection")
        return child

    # -------------------------------------------------------- structure --
    @property
    def input_selector(self) -> ColumnSelector:
        """The selector an op node passes to ``op.transform``.

        A selection parent passes its (possibly grouped) selector through so
        multi-column groups reach ops like Categorify(encode_type="combo")
        (reference categorify.py:350-365); otherwise the parent's flat output
        columns.
        """
        if self.kind == "selection":
            return self.selector
        if self.kind == "op":
            parent = self.parents[0]
            if parent.kind == "selection":
                return parent.selector
            return ColumnSelector(parent.output_columns)
        # addition
        return ColumnSelector(self.output_columns)

    @property
    def output_columns(self) -> list[str]:
        if self.kind == "selection":
            return self.selector.names
        if self.kind == "addition":
            out: list[str] = []
            seen: dict[str, "Node"] = {}
            for p in self.parents:
                for c in p.output_columns:
                    if c not in seen:
                        seen[c] = p
                        out.append(c)
                    elif p.kind == "op" and seen[c].kind == "op":
                        # two OP branches producing the same column: the
                        # later one is silently discarded by the first-wins
                        # dedup — that is a whole branch's computation lost
                        import warnings

                        warnings.warn(
                            f"addition drops duplicate output column {c!r} "
                            f"produced by {p.op.label}; {seen[c].op.label}'s "
                            "result wins — rename one branch if both are "
                            "wanted",
                            UserWarning,
                            stacklevel=2,
                        )
            return out
        return self.op.output_column_names(self.input_selector)

    def root_columns(self) -> list[str]:
        """All root-table columns this subtree reads (selections + op deps)."""
        cols: list[str] = []
        for node in self.topo_order():
            if node.kind == "selection" and not node.parents:
                cols.extend(node.selector.names)
            if node.kind == "op":
                cols.extend(node.op.dependencies)
        seen = set()
        out = []
        for c in cols:
            if c not in seen:
                seen.add(c)
                out.append(c)
        return out

    def topo_order(self) -> list["Node"]:
        order: list[Node] = []
        seen: set[int] = set()

        def visit(n: Node):
            if id(n) in seen:
                return
            seen.add(id(n))
            for p in n.parents:
                visit(p)
            order.append(n)

        visit(self)
        return order

    def __repr__(self):
        if self.kind == "selection":
            return f"<select {self.selector.grouped_names}>"
        if self.kind == "addition":
            return f"<+ of {len(self.parents)}>"
        return f"<node {self.op.label}>"
