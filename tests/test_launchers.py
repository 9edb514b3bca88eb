"""Launcher-preset ↔ CLI drift guard.

The 16 scripts under scripts/ are the canonical config presets (reference C1,
SURVEY §2). Our argparse parsers are strict (unlike the reference's
parse_known_args, which silently swallows typos — a documented footgun), so a
flag renamed in a CLI but not in its launcher would only fail at launch time.
This test extracts every ``--flag`` each launcher passes and asserts the
target CLI module's parser knows it.
"""
import glob
import importlib
import os
import re

import pytest

SCRIPTS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")


class _Stop(Exception):
    pass


def _known_flags(module_name: str) -> set:
    """Capture the CLI's parser options without running it: patch parse_args
    to record option strings and bail."""
    import argparse

    mod = importlib.import_module(module_name)
    captured = {}
    orig = argparse.ArgumentParser.parse_args
    orig_known = argparse.ArgumentParser.parse_known_args

    def fake(self, args=None, namespace=None):
        captured["opts"] = {
            s for a in self._actions for s in a.option_strings
        }
        raise _Stop

    # some CLIs mirror the reference's parse_known_args — patch both
    argparse.ArgumentParser.parse_args = fake
    argparse.ArgumentParser.parse_known_args = fake
    try:
        mod.parse_args([])
    except _Stop:
        pass
    finally:
        argparse.ArgumentParser.parse_args = orig
        argparse.ArgumentParser.parse_known_args = orig_known
    assert "opts" in captured, f"{module_name}.parse_args never built a parser"
    return captured["opts"]


def _launcher_commands(path: str):
    """Yield (module, [flags]) for each ``python -m image_denoising_tpu.cli.X``
    invocation in a .sh/.ps1 launcher (backslash/backtick continuations)."""
    text = open(path).read()
    text = text.replace("\\\n", " ").replace("`\n", " ")
    for m in re.finditer(
        r"python3?\s+-m\s+(image_denoising_tpu\.cli\.\w+)([^\n]*)", text
    ):
        module, rest = m.group(1), m.group(2)
        flags = re.findall(r"(--[A-Za-z0-9_]+)", rest)
        yield module, flags


def _all_launchers():
    return sorted(
        glob.glob(os.path.join(SCRIPTS_DIR, "*.sh"))
        + glob.glob(os.path.join(SCRIPTS_DIR, "*.ps1"))
    )


@pytest.mark.parametrize("path", _all_launchers(), ids=os.path.basename)
def test_launcher_flags_known_to_cli(path):
    cmds = list(_launcher_commands(path))
    assert cmds, f"{os.path.basename(path)} invokes no image_denoising_tpu CLI"
    for module, flags in cmds:
        known = _known_flags(module)
        unknown = [f for f in flags if f not in known]
        assert not unknown, (
            f"{os.path.basename(path)} passes {unknown} to {module}, "
            f"whose parser does not define them"
        )
