"""Regression gate for the offline-derived SPA lockfile.

``frontend/package-lock.json`` was synthesized offline (PARITY.md row 15):
no npm has ever executed it in this environment, so its structural
invariants — the properties ``npm ci`` would enforce on first contact —
are asserted here instead of discovered in CI:

* every package entry carries ``version`` + ``resolved`` + ``integrity``
  (npm ci refuses entries it cannot verify);
* every dependency edge of every package resolves INSIDE the emitted tree
  under npm's node_modules scoping rules (walk up from the dependent's own
  ``node_modules`` to the root), and the resolved entry's version
  satisfies the declared semver range;
* the root entry mirrors ``package.json``'s exact pins, name and version.

The semver matcher below implements the subset of node-semver actually
used by this lockfile (exact, ``*``, ``>=``, ``^``, ``~``, ``||`` unions,
prerelease tags); an unrecognised range fails the test rather than
passing silently.
"""

from __future__ import annotations

import json
import os
import re

import pytest

_FRONTEND = os.path.join(os.path.dirname(__file__), "..", "frontend")


@pytest.fixture(scope="module")
def lock():
    with open(os.path.join(_FRONTEND, "package-lock.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def pkg_json():
    with open(os.path.join(_FRONTEND, "package.json")) as f:
        return json.load(f)


# ---------------------------------------------------------------- semver --

_VER = re.compile(
    r"^(\d+)\.(\d+)\.(\d+)(?:-([0-9A-Za-z.-]+))?(?:\+[0-9A-Za-z.-]+)?$")


def _parse(version: str):
    m = _VER.match(version)
    if not m:
        raise ValueError(f"unparseable version {version!r}")
    pre = m.group(4)
    pre_key = tuple(
        (0, int(p)) if p.isdigit() else (1, p)
        for p in pre.split(".")) if pre is not None else None
    return (int(m.group(1)), int(m.group(2)), int(m.group(3)), pre_key)


def _cmp(a, b):
    """node-semver precedence: numeric triple, then a release beats any
    prerelease of the same triple, then prerelease identifiers."""
    if a[:3] != b[:3]:
        return -1 if a[:3] < b[:3] else 1
    ap, bp = a[3], b[3]
    if ap is None and bp is None:
        return 0
    if ap is None:
        return 1
    if bp is None:
        return -1
    return -1 if ap < bp else (1 if ap > bp else 0)


def _pad(nums: list[str]) -> tuple:
    xs = [int(n) for n in nums]
    return tuple(xs + [0] * (3 - len(xs)))


def _matches_single(range_: str, ver) -> bool:
    r = range_.strip()
    if r in ("*", "", "x"):
        return ver[3] is None  # plain * excludes prereleases
    if r.startswith(">="):
        base = r[2:].strip()
        parts = base.split(".")
        if _VER.match(base):
            lo = _parse(base)
        else:
            lo = _pad(parts) + (None,)
        if ver[3] is not None and (lo[3] is None or ver[:3] != lo[:3]):
            return False  # prerelease only allowed where the range has one
        return _cmp(ver, lo) >= 0
    if r.startswith("^") or r.startswith("~"):
        base = r[1:].strip()
        nparts = len(base.split("."))
        lo = _parse_loose(base)
        if _cmp(ver, lo) < 0:
            return False
        if ver[3] is not None and ver[:3] != lo[:3]:
            return False
        if r.startswith("~"):
            # ~3 := 3.x ; ~2.3[.z] := 2.3.x
            if nparts == 1:
                return ver[0] == lo[0]
            return ver[0] == lo[0] and ver[1] == lo[1]
        # caret: up to the leftmost non-zero component (^0 := 0.x, ^0.0 := 0.0.x)
        if lo[0] > 0 or nparts == 1:
            return ver[0] == lo[0]
        if lo[1] > 0 or nparts == 2:
            return ver[0] == lo[0] and ver[1] == lo[1]
        return ver[:3] == lo[:3]
    if _VER.match(r):
        return _cmp(ver, _parse(r)) == 0
    if re.match(r"^\d+(\.\d+)?(\.x)?$", r):
        # x-range: "3" := 3.x.x, "3.2" := 3.2.x
        parts = [p for p in r.split(".") if p != "x"]
        lo = _pad(parts) + (None,)
        if ver[3] is not None or _cmp(ver, lo) < 0:
            return False
        return ver[:len(parts)] == lo[:len(parts)]
    raise ValueError(f"unsupported range syntax {range_!r}")


def _parse_loose(base: str):
    """Parse a possibly-partial version ('3', '2.3') by zero-padding."""
    if _VER.match(base):
        return _parse(base)
    return _pad(base.split(".")) + (None,)


def semver_satisfies(version: str, range_: str) -> bool:
    ver = _parse(version)
    return any(_matches_single(alt, ver)
               for alt in range_.split("||"))


class TestSemverMatcher:
    """The matcher itself is load-bearing — pin its semantics."""

    @pytest.mark.parametrize("version,range_,ok", [
        ("7.28.6", "^7.27.1", True),
        ("8.0.0", "^7.27.1", False),
        ("7.26.0", "^7.27.1", False),
        ("2.3.3", "~2.3.2", True),
        ("2.4.0", "~2.3.2", False),
        ("4.57.1", "4.57.1", True),
        ("4.57.2", "4.57.1", False),
        ("4.21.0", ">= 4.21.0", True),
        ("4.20.9", ">= 4.21.0", False),
        ("22.1.0", "^18.0.0 || ^20.0.0 || >=22.0.0", True),
        ("19.0.0", "^18.0.0 || ^20.0.0 || >=22.0.0", False),
        ("1.0.0-beta.27", "^1.0.0-beta.2", True),
        ("1.0.0-beta.1", "^1.0.0-beta.2", False),
        ("7.1.0-rc.1", "^7.0.0-0", False),  # prerelease of a DIFFERENT triple
        ("7.0.0-5", "^7.0.0-0", True),
        ("1.2.3", "*", True),
        ("1.2.3-rc.1", "*", False),
        ("0.3.29", "^0.3.12", True),
        ("0.4.0", "^0.3.12", False),
        ("3.7.1", "^3 || ^4", True),
        ("4.0.2", "^3 || ^4", True),
        ("5.0.0", "^3 || ^4", False),
        ("3.2.9", "3", True),
        ("4.0.0", "3", False),
    ])
    def test_cases(self, version, range_, ok):
        assert semver_satisfies(version, range_) is ok


# ------------------------------------------------------------- invariants --


def _resolve(packages: dict, dependent_key: str, dep_name: str):
    """npm scoping: from the dependent's own node_modules, walk up."""
    base = dependent_key  # e.g. "node_modules/@babel/core" or "" (root)
    while True:
        candidate = (f"{base}/node_modules/{dep_name}" if base
                     else f"node_modules/{dep_name}")
        if candidate in packages:
            return candidate, packages[candidate]
        if not base:
            return None, None
        # strip the trailing "/node_modules/<name>" scope level
        idx = base.rfind("/node_modules/")
        base = base[:idx] if idx >= 0 else ""


class TestLockfileInvariants:
    def test_header(self, lock, pkg_json):
        assert lock["lockfileVersion"] == 3
        assert lock["name"] == pkg_json["name"]
        assert lock["version"] == pkg_json["version"]

    def test_every_entry_is_verifiable(self, lock):
        for key, entry in lock["packages"].items():
            if key == "":
                continue
            assert entry.get("version"), f"{key}: missing version"
            assert entry.get("resolved", "").startswith(
                "https://registry.npmjs.org/"), f"{key}: bad resolved"
            assert entry.get("integrity", "").startswith(
                ("sha512-", "sha1-")), f"{key}: missing integrity"
            _parse(entry["version"])  # parseable semver

    def test_root_mirrors_package_json(self, lock, pkg_json):
        root = lock["packages"][""]
        assert root["dependencies"] == pkg_json["dependencies"]
        assert root["devDependencies"] == pkg_json["devDependencies"]

    def test_package_json_pins_are_exact_and_installed(self, lock, pkg_json):
        """The manifest pins exact versions; each must be the version the
        lock actually installs at root scope."""
        for section in ("dependencies", "devDependencies"):
            for name, pin in pkg_json[section].items():
                assert _VER.match(pin), f"{name}: pin {pin!r} not exact"
                key, entry = _resolve(lock["packages"], "", name)
                assert entry is not None, f"{name}: not in lock tree"
                assert entry["version"] == pin, (
                    f"{name}: lock has {entry['version']}, manifest pins "
                    f"{pin}")

    def test_every_dependency_edge_resolves_in_tree(self, lock):
        """For every package entry, every (optional/peer/regular) dep must
        resolve somewhere up the node_modules chain at a satisfying
        version — one bad edge is exactly the failure mode an offline
        derivation risks and the first real `npm ci` would hit."""
        packages = lock["packages"]
        checked = 0
        for key, entry in packages.items():
            deps: dict[str, str] = {}
            if key == "":
                deps.update(entry.get("dependencies", {}))
                deps.update(entry.get("devDependencies", {}))
            else:
                deps.update(entry.get("dependencies", {}))
                meta = entry.get("peerDependenciesMeta", {})
                deps.update({  # optional peers need not be installed
                    n: r for n, r in entry.get("peerDependencies", {}).items()
                    if not meta.get(n, {}).get("optional")})
                deps.update(entry.get("optionalDependencies", {}))
            for name, rng in deps.items():
                found_key, found = _resolve(packages, key, name)
                assert found is not None, f"{key} -> {name}: unresolvable"
                assert semver_satisfies(found["version"], rng), (
                    f"{key} -> {name}@{rng}: resolved {found_key} "
                    f"has {found['version']}")
                checked += 1
        assert checked > 150  # the closure is real, not vacuous (168 today)

    def test_platform_packages_are_optional(self, lock):
        """Every os/cpu-constrained binary package must be optional, or
        `npm ci` on the CI's linux-x64 runner would fail trying to install
        a darwin/win32 artifact."""
        for key, entry in lock["packages"].items():
            if key and ("os" in entry or "cpu" in entry):
                plats = entry.get("os", ["linux"])
                if "linux" not in plats or \
                        "x64" not in entry.get("cpu", ["x64"]):
                    assert entry.get("optional"), f"{key}: not optional"
