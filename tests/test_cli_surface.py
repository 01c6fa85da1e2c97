"""CLI argparse-surface parity against the reference parsers.

Extracts every ``add_argument`` call from both the reference entry
points and this repo's CLIs via ``ast`` (the reference parsers live in
``__main__`` blocks and cannot be imported without torch/CUDA), then
asserts each reference flag exists here with the same dest, nargs,
choices and — for behaviour-critical flags — the same default, so an
unflagged invocation behaves identically (reference regressor/demo.py:
358-439, measurements/virtual_measurements.py:104-131,
attributes/demo.py:130-147, regressor/hbw_evaluation/evaluate_hbw.py:
190-226, regressor/human_shape/config/cmd_parser.py:12-49).
"""

import ast
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

_SENTINEL = "<non-literal>"


def extract_arg_specs(path):
    """{primary_flag: {"flags": [...], "dest": str, **literal kwargs}}"""
    with open(path) as f:
        tree = ast.parse(f.read())
    specs = {}
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "add_argument"
        ):
            continue
        flags = []
        for arg in node.args:
            if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                flags.append(arg.value)
        if not flags or not flags[0].startswith("-"):
            continue
        kw = {}
        for k in node.keywords:
            if k.arg is None:
                continue
            try:
                kw[k.arg] = ast.literal_eval(k.value)
            except (ValueError, SyntaxError):
                kw[k.arg] = _SENTINEL
        if "dest" not in kw:
            long = next((f for f in flags if f.startswith("--")), flags[0])
            kw["dest"] = long.lstrip("-").replace("-", "_")
        kw["flags"] = flags
        specs[flags[0]] = kw
    return specs


def assert_surface_superset(ours_path, ref_path, *, exclude=(),
                            skip_defaults=()):
    ours = extract_arg_specs(ours_path)
    ref = extract_arg_specs(ref_path)
    assert ref, f"no add_argument calls found in {ref_path}"

    # flag -> spec over ALL our option strings (we accept the reference
    # spelling as an alias where our primary differs, e.g.
    # --demo_output_folder).
    our_flags = {}
    for spec in ours.values():
        for f in spec["flags"]:
            our_flags[f] = spec

    problems = []
    for flag, rspec in ref.items():
        if flag in exclude or rspec["dest"] in exclude:
            continue
        ospec = our_flags.get(flag)
        if ospec is None:
            problems.append(f"missing reference flag {flag}")
            continue
        if ospec["dest"] != rspec["dest"]:
            problems.append(
                f"{flag}: dest {ospec['dest']!r} != {rspec['dest']!r}")
        for key in ("nargs", "choices", "required"):
            rv = rspec.get(key)
            if rv is not None and rv != _SENTINEL and ospec.get(key) != rv:
                problems.append(
                    f"{flag}: {key} {ospec.get(key)!r} != {rv!r}")
        rdefault = rspec.get("default", _SENTINEL)
        if (
            flag not in skip_defaults
            and rspec["dest"] not in skip_defaults
            and rdefault != _SENTINEL
            and ospec.get("default", _SENTINEL) != _SENTINEL
            and ospec.get("default") != rdefault
        ):
            problems.append(
                f"{flag}: default {ospec.get('default')!r} != {rdefault!r}")
    assert not problems, (
        f"{ours_path} diverges from {ref_path}:\n  " + "\n  ".join(problems)
    )


needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


@needs_ref
def test_demo_cli_surface():
    # Full parity incl. defaults: --save-vis/--save-mesh/--save-params
    # default False like the reference (demo.py:389-397); --exp-cfg has
    # no default in the reference (None) vs our [] — behaviourally
    # identical (both merge nothing), so exempted.
    assert_surface_superset(
        os.path.join(REPO, "shapy_tpu/cli/demo.py"),
        os.path.join(REF, "regressor/demo.py"),
        skip_defaults=("--exp-cfg",),
    )


@needs_ref
def test_virtual_measurements_cli_surface():
    # Measurement yaml paths default to the vendored copies here instead
    # of the reference's ../data relative layout; values are identical
    # (assets/measurements/*.yaml is bit-identical, see VERDICT r4).
    assert_surface_superset(
        os.path.join(REPO, "shapy_tpu/cli/virtual_measurements.py"),
        os.path.join(REF, "measurements/virtual_measurements.py"),
        skip_defaults=("meas_definition_path", "meas_vertices_path"),
    )


@needs_ref
def test_evaluate_hbw_cli_surface():
    assert_surface_superset(
        os.path.join(REPO, "shapy_tpu/cli/evaluate_hbw.py"),
        os.path.join(REF, "regressor/hbw_evaluation/evaluate_hbw.py"),
    )


@needs_ref
def test_attributes_demo_cli_surface():
    # demo_output_folder default points at this repo's samples layout.
    assert_surface_superset(
        os.path.join(REPO, "shapy_tpu/cli/attributes_demo.py"),
        os.path.join(REF, "attributes/demo.py"),
        skip_defaults=("demo_output_folder",),
    )


@needs_ref
def test_evaluate_cli_surface():
    # --local_rank/--num-gpus/--backend are the reference's
    # torch.distributed/NCCL surface (cmd_parser.py:25-33); the TPU-native
    # equivalent is --num-devices over a jax Mesh (SURVEY §2.8).
    assert_surface_superset(
        os.path.join(REPO, "shapy_tpu/cli/evaluate.py"),
        os.path.join(REF, "regressor/human_shape/config/cmd_parser.py"),
        exclude=("--local_rank", "--num-gpus", "--backend"),
        skip_defaults=("--exp-cfg",),
    )


@needs_ref
def test_unflagged_demo_invocation_matches_reference():
    """The parsed namespace of an unflagged run agrees on the shared
    behaviour flags (the VERDICT r4 weak-#4 regression)."""
    import importlib
    import sys

    sys.path.insert(0, REPO)
    demo = importlib.import_module("shapy_tpu.cli.demo")
    args = demo.build_parser().parse_args([])
    ref = extract_arg_specs(os.path.join(REF, "regressor/demo.py"))
    for flag in ("--save-vis", "--save-mesh", "--save-params", "--show"):
        assert getattr(args, ref[flag]["dest"]) == ref[flag]["default"], flag
    assert args.split == "test"
    assert args.output_folder == "demo_output"
    # the reference's truth-parser accepts only the literal 'true'
    assert demo.build_parser().parse_args(
        ["--save-vis", "1"]).save_vis is False
    assert demo.build_parser().parse_args(
        ["--save-vis", "True"]).save_vis is True
