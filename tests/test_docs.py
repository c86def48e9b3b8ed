"""docs/cli.md is GENERATED from the argparse parsers (tools/gen_docs.py);
this gate makes flag/doc drift impossible: any parser change must ship with
a regenerated document in the same commit."""
import os

from iggcn_tpu.tools.gen_docs import DOC_PATH, render_cli_md


def test_cli_reference_in_sync():
    assert os.path.isfile(DOC_PATH), (
        "docs/cli.md missing; generate with python -m iggcn_tpu.tools.gen_docs")
    with open(DOC_PATH) as fh:
        on_disk = fh.read()
    assert on_disk == render_cli_md(), (
        "docs/cli.md is stale; regenerate with "
        "python -m iggcn_tpu.tools.gen_docs")


def test_every_driver_flag_has_help():
    """The experiment driver is the primary user surface: every flag must
    carry a help string (it feeds both --help and docs/cli.md)."""
    import argparse

    import main

    missing = [a.option_strings or [a.dest]
               for a in main.build_parser()._actions
               if not isinstance(a, argparse._HelpAction) and not a.help]
    assert not missing, f"flags without help text: {missing}"


def test_doc_covers_every_model_name():
    import main

    with open(DOC_PATH) as fh:
        doc = fh.read()
    for name in (tuple(main.FUSION_MODELS) + main.ZOO_MODELS
                 + main.SNP_MODELS):
        assert f"`{name}`" in doc, f"model {name} missing from docs/cli.md"
