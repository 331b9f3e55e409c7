"""Model-graph visualization (reference: curl/nn/tensorboard.py:70).

Emits a Graphviz-style DOT description of an encrypted model's module tree
(and, for fx-converted GraphModules, the op graph). If a SummaryWriter-like
object is supplied, the DOT text is logged as text; no tensorboard
dependency is required."""

from __future__ import annotations

from .module import Module


def graph_to_dot(model: Module, name="curl_model") -> str:
    lines = [f"digraph {name} {{", "  rankdir=TB;"]
    prev = None
    for path, mod in model.named_modules():
        label = f"{path or 'root'}\\n{type(mod).__name__}"
        node = (path or "root").replace(".", "_")
        shape = "box" if mod._parameters else "ellipse"
        lines.append(f'  {node} [label="{label}", shape={shape}];')
        if "." in (path or ""):
            parent = path.rsplit(".", 1)[0].replace(".", "_")
            lines.append(f"  {parent} -> {node};")
        elif path:
            lines.append(f"  root -> {node};")
    lines.append("}")
    return "\n".join(lines)


class SummaryWriter:
    """Minimal writer: add_graph logs the DOT text to a file."""

    def __init__(self, log_dir="/tmp/curl_tpu_tb"):
        import os

        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir

    def add_graph(self, model, name="model"):
        import os

        dot = graph_to_dot(model, name)
        path = os.path.join(self.log_dir, f"{name}.dot")
        with open(path, "w") as f:
            f.write(dot)
        return path
