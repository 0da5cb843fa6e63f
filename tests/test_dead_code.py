"""Unreachable-code linter over the package (AST-based).

Round 3 shipped a crash because two statements were stranded after a
`return` inside `TrajOptSolver._scaled_rollout_cfg` (commit cc28aaf), so the
attribute they initialized never existed. This sweep fails the suite on any
statement that directly follows a terminating statement (`return`, `raise`,
`break`, `continue`) in the same block, anywhere under curobo_tpu/.
"""

import ast
import os

PKG = os.path.join(os.path.dirname(__file__), "..", "curobo_tpu")

_TERMINATORS = (ast.Return, ast.Raise, ast.Break, ast.Continue)


def _unreachable_in(body, path, findings):
    terminated = False
    for stmt in body:
        if terminated:
            findings.append(f"{path}:{stmt.lineno}: unreachable statement")
            break  # one finding per block is enough
        if isinstance(stmt, _TERMINATORS):
            terminated = True


def test_no_unreachable_statements():
    findings = []
    for root, _, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                tree = ast.parse(f.read(), filename=path)
            rel = os.path.relpath(path, os.path.dirname(PKG))
            for node in ast.walk(tree):
                for field in ("body", "orelse", "finalbody"):
                    body = getattr(node, field, None)
                    if isinstance(body, list) and body and isinstance(
                        body[0], ast.stmt
                    ):
                        _unreachable_in(body, rel, findings)
    assert not findings, "\n".join(findings)
