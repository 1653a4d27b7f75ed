"""Docs <-> CLI surface sync.

Every `zenker-*` / `$CLI.<module>` command the user-facing docs show must
parse against the real argparse parsers: the script name must exist in
pyproject's console scripts, every `--flag` must be a real option of that
command, and values shown for choice-restricted flags must be valid
choices. Docs drift (a renamed flag, a removed command) is an
adopter-facing failure mode nothing else pins — the reference has no
equivalent check (its README commands went stale against its own scripts;
see SURVEY.md section 6 notes on flag drift).
"""

import argparse
import importlib
import re
import shlex
import tomllib
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOCS = ["README.md", "VALIDATE_REAL.md", "ROOFLINE.md"]

# zenker-<script> (console-script form) or $CLI.<module> (python -m form,
# README defines CLI=python -m zenker_audio_detection_tpu.cli)
CMD_RE = re.compile(r"zenker-([a-z0-9][a-z0-9-]*)|\$CLI\.(\w+)")


def script_to_module():
    with open(REPO / "pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    return {name: target.split(":")[0].rsplit(".", 1)[-1]
            for name, target in scripts.items()}


class _Captured(Exception):
    pass


@pytest.fixture(scope="module")
def parsers():
    """Module name -> the ArgumentParser its main() actually uses,
    captured by spying on parse_args (parsers are built inside main)."""
    cache = {}
    real = argparse.ArgumentParser.parse_args

    def grab(module_name):
        if module_name in cache:
            return cache[module_name]
        mod = importlib.import_module(
            f"zenker_audio_detection_tpu.cli.{module_name}")
        box = {}

        def spy(self, args=None, namespace=None):
            box.setdefault("parser", self)
            raise _Captured

        argparse.ArgumentParser.parse_args = spy
        try:
            mod.main([])
        except _Captured:
            pass
        finally:
            argparse.ArgumentParser.parse_args = real
        assert "parser" in box, f"{module_name}.main never called parse_args"
        cache[module_name] = box["parser"]
        return box["parser"]

    return grab


def doc_commands():
    """Yield (doc, lineno, module, argv-after-command) for every command
    occurrence in fenced code blocks and inline code spans."""
    mapping = script_to_module()
    out = []
    for doc in DOCS:
        text = (REPO / doc).read_text(encoding="utf-8")
        # join backslash-newline continuations so multi-line commands are
        # one logical line (keeps linenos of the first physical line)
        joined, lineno_of = [], []
        pending, pending_no = "", None
        for i, raw in enumerate(text.splitlines(), 1):
            if pending:
                merged = pending + " " + raw.strip()
            else:
                merged, pending_no = raw, i
            if merged.rstrip().endswith("\\"):
                pending = merged.rstrip()[:-1].rstrip()
                continue
            joined.append(merged)
            lineno_of.append(pending_no)
            pending = ""
        fence = False
        for line, no in zip(joined, lineno_of):
            if line.strip().startswith("```"):
                fence = not fence
                continue
            candidates = [line] if fence else re.findall(r"`([^`]+)`", line)
            for cand in candidates:
                if not CMD_RE.search(cand):
                    continue
                cand = cand.split(" #")[0]  # shell comments
                for segment in cand.split("|"):
                    m = CMD_RE.search(segment)
                    if not m:
                        continue
                    if m.group(1) is not None:
                        name = "zenker-" + m.group(1)
                        if segment[:m.start()].endswith("/"):
                            continue  # repo path like .../zenker-audio-detection
                        assert name in mapping, (
                            f"{doc}:{no} names unknown command {name!r}")
                        module = mapping[name]
                    else:
                        module = m.group(2)
                        assert (REPO / "zenker_audio_detection_tpu" / "cli"
                                / f"{module}.py").exists(), (
                            f"{doc}:{no} names unknown CLI module {module!r}")
                    try:
                        tokens = shlex.split(segment[m.end():])
                    except ValueError:
                        tokens = segment[m.end():].split()
                    out.append((doc, no, module, tokens))
    return out


def test_docs_reference_commands_exist():
    cmds = doc_commands()
    # the README command tour is substantial; if extraction breaks and
    # finds almost nothing, that's a bug in THIS test, not clean docs
    assert len(cmds) >= 20, [c[:3] for c in cmds]
    assert {c[2] for c in cmds} >= {
        "prepare_dataset", "train_stage1", "serve", "validate_real",
        "drift", "adapt_checkpoint", "run_all_folds"}


def test_every_documented_flag_parses(parsers):
    problems = []
    checks = []
    for doc, no, module, tokens in doc_commands():
        # zenker-serve-supervisor forwards everything after `--` to
        # zenker-serve: validate each side against its own parser
        if module == "serve_supervisor" and "--" in tokens:
            cut = tokens.index("--")
            checks.append((doc, no, module, tokens[:cut]))
            checks.append((doc, no, "serve", tokens[cut + 1:]))
        else:
            checks.append((doc, no, module, tokens))
    for doc, no, module, tokens in checks:
        opts = parsers(module)._option_string_actions
        for i, tok in enumerate(tokens):
            if not tok.startswith("--") or tok == "--":
                continue
            flag = tok.split("=", 1)[0]
            if flag not in opts:
                problems.append(f"{doc}:{no}: {module} has no {flag}")
                continue
            action = opts[flag]
            val = tok.split("=", 1)[1] if "=" in tok else (
                tokens[i + 1] if i + 1 < len(tokens) else None)
            if (action.choices and val and not val.startswith(("-", "$"))
                    and val != "..."):
                if val not in [str(c) for c in action.choices]:
                    problems.append(
                        f"{doc}:{no}: {module} {flag}={val!r} not in "
                        f"choices {sorted(map(str, action.choices))}")
    assert not problems, "\n".join(problems)


def test_console_script_names_in_prose_are_real():
    """Any zenker-<name> mentioned ANYWHERE in the docs (prose included)
    must be a real console script — stale names mislead adopters."""
    mapping = script_to_module()
    stale = []
    for doc in DOCS + ["PARITY.md"]:
        text = (REPO / doc).read_text(encoding="utf-8")
        for m in CMD_RE.finditer(text):
            if m.group(1) is None:
                continue
            if text[:m.start()].endswith("/"):
                continue  # upstream repo path
            name = "zenker-" + m.group(1)
            if name not in mapping:
                stale.append(f"{doc}: {name}")
    assert not stale, sorted(set(stale))
