"""Reference-citation integrity.

Package docstrings cite `file.py:line[-line]` anchors (reference scripts,
our own modules, HF sources) so parity claims can be checked. This test
resolves every citation and asserts the file exists and the cited line
range is inside it — a citation pointing past EOF was wrong when written
or rotted when code moved, and either way misdirects a parity audit.
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "zenker_audio_detection_tpu"
REFERENCE = Path("/root/reference")

CITE_RE = re.compile(
    r"([A-Za-z0-9_/.-]+\.(?:py|sh|yaml|cpp)):(\d+)(?:-(\d+))?")


def _line_counts(root, patterns):
    counts = {}
    for pat in patterns:
        for p in root.rglob(pat):
            if ".git" in p.parts or "node_modules" in p.parts:
                continue
            try:
                counts[p] = len(p.read_text(
                    encoding="utf-8", errors="replace").splitlines())
            except OSError:
                pass
    return counts


def collect_citations():
    cites = []
    for src in [*PKG.rglob("*.py"), REPO / "bench.py",
                REPO / "__graft_entry__.py"]:
        text = src.read_text(encoding="utf-8")
        for m in CITE_RE.finditer(text):
            end = int(m.group(3) or m.group(2))
            cites.append((src.relative_to(REPO), m.group(1), end))
    return cites


def test_every_citation_resolves_inside_a_real_file():
    ref = _line_counts(REFERENCE, ["*.py", "*.sh", "*.yaml"])
    ours = _line_counts(REPO / "zenker_audio_detection_tpu", ["*.py"])
    ours.update(_line_counts(REPO / "native", ["*.cpp"]))
    try:  # HF sources cited for model-parity anchors
        import transformers
        hf = _line_counts(Path(transformers.__file__).parent, ["*.py"])
    except ImportError:
        hf = {}

    cites = collect_citations()
    assert len(cites) >= 60, "citation extraction broke"

    problems = []
    for where, cited, end in cites:
        if cited.startswith("/"):
            cands = {Path(cited): ref.get(Path(cited))} \
                if Path(cited).exists() else {}
            if cands and cands[Path(cited)] is None:
                cands = _line_counts(Path(cited).parent, [Path(cited).name])
                cands = {p: n for p, n in cands.items()
                         if str(p) == cited}
        else:
            cands = {p: n for pool in (ref, ours, hf)
                     for p, n in pool.items()
                     if str(p).endswith("/" + cited)
                     or p.name.endswith(cited)}  # prose "…_2stage.py"
        if not cands:
            problems.append(f"{where}: {cited} resolves to no file")
        elif not any(n >= end for n in cands.values()):
            longest = max(cands.values())
            problems.append(
                f"{where}: {cited}:{end} past EOF (longest match has "
                f"{longest} lines)")
    assert not problems, "\n".join(problems)
