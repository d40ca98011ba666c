"""
Operator-expression-tree visualization (parity: dedalus/tools/plot_op.py).

`tree_text` renders the tree as indented text (no dependencies);
`plot_operator` writes a graphviz dot/png when graphviz is available.
"""

import numbers


def _label(node):
    from ..core.field import Field
    from ..core.future import Future
    if isinstance(node, Field):
        return node.name or 'Field'
    if isinstance(node, Future):
        name = type(node).__name__
        extra = getattr(node, 'name', None)
        return f"{name}" if not extra else f"{name}({extra})"
    if isinstance(node, numbers.Number):
        return repr(node)
    return type(node).__name__


def _children(node):
    from ..core.future import Future
    if isinstance(node, Future):
        kids = list(getattr(node, '_operands', None) or getattr(node, 'args', []))
        scalar = getattr(node, 'scalar', 1)
        if isinstance(scalar, numbers.Number) and scalar != 1:
            kids = [scalar] + kids
        return kids
    return []


def tree_text(expr, indent=""):
    """Indented text rendering of an operator tree."""
    lines = [indent + _label(expr)]
    kids = _children(expr)
    for i, kid in enumerate(kids):
        lines.extend(tree_text(kid, indent + "  ").splitlines())
    return "\n".join(lines)


def plot_operator(expr, filename="operator_tree"):
    """Write a graphviz rendering of the tree (falls back to a .txt file
    with the text rendering when graphviz is unavailable)."""
    def _text_fallback():
        path = filename + ".txt"
        with open(path, "w") as f:
            f.write(tree_text(expr) + "\n")
        return path

    try:
        import graphviz
    except ImportError:
        return _text_fallback()
    dot = graphviz.Digraph()
    counter = [0]

    def add(node):
        nid = str(counter[0])
        counter[0] += 1
        dot.node(nid, _label(node))
        for kid in _children(node):
            kid_id = add(kid)
            dot.edge(nid, kid_id)
        return nid

    add(expr)
    try:
        return dot.render(filename, format="png", cleanup=True)
    except graphviz.backend.execute.ExecutableNotFound:
        return _text_fallback()
