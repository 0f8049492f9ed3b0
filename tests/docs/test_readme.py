"""The README quickstart must run and produce the advertised posterior
means (reference README makes the same promise at
``/root/reference/README.md:109-123``)."""

import pathlib
import re

import jax.numpy as jnp

README = pathlib.Path(__file__).parents[2] / "README.md"


def test_readme_quickstart():
    text = README.read_text()
    block = re.findall(r"```python\n(.*?)```", text, re.S)[0]
    # Drop the bare illustrative calls at the end; invoke them ourselves
    # so we can assert on the results.
    block = "\n".join(
        ln for ln in block.splitlines() if not ln.startswith("run_inference(")
    )
    ns: dict = {}
    exec(compile(block, str(README), "exec"), ns)  # noqa: S102
    p_true = ns["run_inference"](True)
    p_false = ns["run_inference"](False)
    assert jnp.abs(p_true - 0.6) < 0.05, p_true
    assert jnp.abs(p_false - 0.4) < 0.05, p_false
