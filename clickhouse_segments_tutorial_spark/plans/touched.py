"""Derive this round's edited query modules from git, replacing the
hand-maintained ROUND_TOUCHED set (r9 verdict item 4: a forgotten hand
entry silently ships an edited query without a driver re-check — the
exact failure the pinning mechanism exists to prevent).

Mechanism:

1. **Base commit** = the commit that last touched the newest
   ``CORRECTNESS_r{N}.json``. The driver commits each round's artifacts
   in one "round N: verdict/advice/correctness/bench" commit at round
   start, so diffing the working tree against that commit yields exactly
   the CURRENT round's edits — self-maintaining, no snapshot file to
   refresh.
2. **Changed files** = ``git diff --name-only <base>`` (committed and
   uncommitted edits) plus untracked files, filtered to the package.
3. **Import closure**: an AST walk over every package module collects its
   imports (top-level AND function-local — the plans modules import
   operators lazily inside query functions), building a module
   dependency graph. A query module is *touched* when any file in its
   transitive import closure changed — so editing
   ``operators/sampling.py`` pins every query whose plans module
   (transitively) uses it, matching what the r9 hand list encoded
   manually.

Degradation: PERMANENT causes (no git binary, not a repository, no
committed CORRECTNESS files, parse errors) -> empty derived set, safe to
memoize; RETRYABLE git failures (index.lock contention, timeouts) raise
TransientGitError so the registry degrades for that call only instead of
caching pinning-off for the whole process. The rotation in
registry.all_queries() still guarantees every query a driver row over two
consecutive rounds; pinning is an optimization on top, never a
correctness dependency. A manual
``ROUND_TOUCHED_OVERRIDE`` remains in registry.py for queries whose
behavior changed without a package-file edit (e.g. testdata contract
changes).
"""

from __future__ import annotations

import ast
import functools
import re
import subprocess
from pathlib import Path

PKG = "clickhouse_segments_tutorial_spark"


class TransientGitError(RuntimeError):
    """A git invocation failed in a way that may succeed on retry (a
    concurrent operation holding index.lock, a timeout) — as opposed to
    PERMANENT degradation (no git binary, not a repository, no committed
    round artifacts), which returns None/{}. The registry's memoization
    caches permanent degradation but must NOT cache a transient failure:
    doing so silently disables pinning for the whole process, shipping
    this round's edited queries without a driver re-check (r10
    third-review finding 4 — the previous code folded both cases into
    None, making the registry's degrade-for-this-call-only branch
    unreachable)."""


def _run_git(args: list[str], cwd: Path) -> str:
    """Run one git command, separating permanent from transient failure:
    a missing git binary or a non-repository raises RuntimeError (the
    caller degrades permanently); anything else — timeout, index.lock
    contention, other nonzero exits — raises TransientGitError."""
    try:
        return subprocess.run(
            ["git", *args],
            cwd=cwd,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout
    except FileNotFoundError:
        raise RuntimeError("git binary not found")
    except subprocess.CalledProcessError as e:
        if "not a git repository" in (e.stderr or "").lower():
            raise RuntimeError("not a git repository")
        raise TransientGitError(f"git {args[0]} failed: {e.stderr!r}")
    except (OSError, subprocess.SubprocessError) as e:
        raise TransientGitError(f"git {args[0]} failed: {e!r}")

# Modules whose imports ENUMERATE rather than USE: registry.py imports
# every QUERIES module solely to list their specs, which would otherwise
# close the cycle (plans -> registry for QuerySpec, registry -> plans for
# enumeration) and make every plans module reverse-reachable from every
# other — one curation edit would pin all 98 queries (r10 self-review
# finding 1: the degenerate all-pinned order sorts genuinely edited
# queries BEHIND less-recently-verified peers). Their OUTGOING edges are
# dropped from the graph; their own reverse closure (everything imports
# registry for QuerySpec) still exists and is handled by the registry's
# breadth filter.
ENUMERATOR_FILES = frozenset({f"{PKG}/plans/registry.py"})


def _repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def _base_commit(repo_root: Path) -> str | None:
    """Commit that last modified the newest COMMITTED CORRECTNESS_r*.json.

    Newest-round-first with a fallback to earlier rounds: the driver may
    write the current round's file mid-round before committing it, and
    `git log` on an uncommitted file returns nothing — without the
    fallback that would silently disable pinning exactly when the
    current round's edits need re-checking."""
    rounds: list[tuple[int, Path]] = []
    for p in repo_root.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            rounds.append((int(m.group(1)), p))
    for _, path in sorted(rounds, reverse=True):
        try:
            out = _run_git(
                ["log", "-n1", "--format=%H", "--", path.name], repo_root
            ).strip()
        except RuntimeError as e:
            if isinstance(e, TransientGitError):
                raise
            return None
        if out:
            return out
    return None


def changed_package_files(repo_root: Path) -> set[str] | None:
    """Repo-relative paths of package .py files edited since the base
    commit (committed, staged, unstaged, or untracked). None when the
    base is PERMANENTLY undeterminable (no git / not a repository / no
    round artifacts); raises TransientGitError on retryable git failure
    so the caller degrades for one call without caching (_run_git)."""
    base = _base_commit(repo_root)
    if base is None:
        return None
    try:
        diff = _run_git(["diff", "--name-only", base, "--", PKG], repo_root)
        untracked = _run_git(
            ["ls-files", "--others", "--exclude-standard", PKG], repo_root
        )
    except RuntimeError as e:
        if isinstance(e, TransientGitError):
            raise
        return None
    return {
        line.strip()
        for line in (diff + untracked).splitlines()
        if line.strip().endswith(".py")
    }


def _resolve_import(module_parts: list[str], node: ast.ImportFrom | ast.Import,
                    existing: set[str]) -> set[str]:
    """Map one import statement in module ``module_parts`` (package-
    relative, e.g. ['plans', 'curation']) to the package-relative module
    paths it references, keeping only paths in ``existing``."""
    out: set[str] = set()

    def add(parts: list[str]) -> None:
        rel = "/".join(parts) + ".py"
        if rel in existing:
            out.add(rel)
        init = "/".join(parts + ["__init__"]) + ".py"
        if init in existing:
            out.add(init)

    if isinstance(node, ast.Import):
        for alias in node.names:
            parts = alias.name.split(".")
            if parts[0] == PKG:
                add(parts[1:])
        return out
    # ImportFrom: resolve the (possibly relative) base module
    if node.level > 0:
        # level=1: sibling of this module's package; level=2: one up...
        base = module_parts[: len(module_parts) - node.level]
        if node.module:
            base = base + node.module.split(".")
    else:
        parts = (node.module or "").split(".")
        if parts[:1] != [PKG]:
            return out
        base = parts[1:]
    add(base)
    # names may be submodules of a package base (from ..operators import dedup)
    for alias in node.names:
        add(base + [alias.name])
    return out


@functools.lru_cache(maxsize=4)
def _import_graph(pkg_dir: str) -> dict[str, set[str]]:
    """rel_path -> set of rel_paths it imports (direct edges only).
    Paths are relative to the repo root (``{PKG}/...``)."""
    root = Path(pkg_dir)
    files = {str(p.relative_to(root.parent)) for p in root.rglob("*.py")}
    pkg_rel = {f[len(PKG) + 1:] for f in files}  # without the pkg prefix
    graph: dict[str, set[str]] = {}
    for f in sorted(files):
        rel = f[len(PKG) + 1:]
        # Keep '__init__' as the last component: stripping `level` parts
        # then lands on the package itself, making relative-import
        # arithmetic uniform for modules and __init__ files alike.
        module_parts = rel[:-3].split("/")  # drop .py
        try:
            tree = ast.parse((root.parent / f).read_text())
        except (OSError, SyntaxError):
            graph[f] = set()
            continue
        deps: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                deps |= {
                    f"{PKG}/{d}"
                    for d in _resolve_import(module_parts, node, pkg_rel)
                }
        deps.discard(f)
        graph[f] = set() if f in ENUMERATOR_FILES else deps
    return graph


def _reverse_closure(graph: dict[str, set[str]], seed: set[str]) -> set[str]:
    """seed plus every module that (transitively) imports a seed module."""
    out = set(seed)
    grew = True
    while grew:
        grew = False
        for mod, deps in graph.items():
            if mod not in out and deps & out:
                out.add(mod)
                grew = True
    return out


def touched_modules_by_change(
    repo_root: Path | str | None = None,
) -> dict[str, set[str]]:
    """Per changed file: its reverse import closure (the file itself plus
    every module that transitively imports it). Lets the caller weigh
    each change's BREADTH — registry drops global-infrastructure changes
    whose closure spans (nearly) every query module, which would
    otherwise pin everything and destroy the pinning signal (r10
    self-review finding: a registry.py edit derived all 98 queries as
    touched, sorting the genuinely edited ones BEHIND their
    less-recently-verified peers). Empty dict on permanent degradation;
    TransientGitError propagates (module docstring)."""
    root = Path(repo_root) if repo_root is not None else _repo_root()
    changed = changed_package_files(root)
    if not changed:
        return {}
    graph = _import_graph(str(root / PKG))
    changed &= set(graph)  # only package .py files matter
    return {f: _reverse_closure(graph, {f}) for f in changed}


def touched_modules(repo_root: Path | str | None = None) -> set[str]:
    """Package modules (repo-relative paths) whose transitive import
    closure contains a file changed this round — ALL changes, breadth
    unweighted. Empty set on permanent degradation; TransientGitError
    propagates (see module docstring)."""
    by_change = touched_modules_by_change(repo_root)
    out: set[str] = set()
    for closure in by_change.values():
        out |= closure
    return out
