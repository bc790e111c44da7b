"""bench.py structural guards.

The driver runs bench.py unattended on real hardware at end of round; a
syntax error in its subprocess code template or a renamed symbol must be
caught here, not there."""


def test_label_subprocess_code_compiles():
    import re

    src = open("bench.py").read()
    m = re.search(r"label_code = \(\n(.*?)\n    \)\n", src, re.S)
    assert m, "label_code template not found"
    # evaluate the template literal the same way bench.py builds it
    ns = {"sub": 4, "n_label": 1000, "degraded": True}
    code_expr = "(" + m.group(1) + ")"
    template = eval(code_expr, {}, ns)  # concatenated f-strings
    for flag in ("None", "False"):
        compile(template.format(flag=flag), "<label_code>", "exec")


def test_bench_symbols_exist():
    """Every sdf_representation_tpu symbol bench.py imports must resolve."""
    import ast

    tree = ast.parse(open("bench.py").read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and \
                node.module.startswith("sdf_representation_tpu"):
            mod = __import__(node.module, fromlist=[a.name for a in node.names])
            for a in node.names:
                assert hasattr(mod, a.name), (node.module, a.name)
