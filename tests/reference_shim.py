"""Load the actually-executing reference ``pxmcmc`` (sampler + utils layers).

The reference's sampler layer has no C dependency of its own —
``/root/reference/pxmcmc/mcmc.py:1-3`` imports only numpy, scipy.stats and
``pxmcmc.utils`` — and its operator layer only touches the C libraries
through handles bound at construction time.  Stubbing the C-backed extension
modules (pys2let / pyssht / healpy / astropy) therefore lets the *real*
reference ``MYULA.run()`` / ``PxMALA.run()`` and the utils oracles
(``soft`` / ``hard`` / ``chebyshev*`` / ``flatten_mlm`` /
``expand_mlm``, ``utils.py:11-88,128-197``) execute in this image for
direct ours-vs-reference parity tests (round-3 VERDICT missing #1).

Only code paths that never call into the stubs are exercised: Identity
transform + Identity measurement models and pure-numpy utilities.  The
reference source is loaded (not copied) from ``/root/reference`` under the
private package name ``refpxmcmc`` so it cannot collide with this repo's
``pxmcmc`` compatibility alias.
"""
from __future__ import annotations

import hashlib
import os
import sys
import types

_REF_DIR = "/root/reference/pxmcmc"
_cache = None

# Content pins for the loaded files: the reference tree is untrusted public
# content, and ``load_reference`` exec()s these six modules in-process.  An
# unexpected edit to /root/reference must fail loudly (skip the parity
# tests) rather than execute unreviewed code.
_PINNED_SHA256 = {
    "utils": "d22e1359bbb5c834d2f518c13aed01b461a586ea8941e5264552b0956d32850a",
    "transforms": "7d8df83a1978891af6aa058043cb8d5dd073f89bd906a41009ef29f5a2aa1262",
    "measurements": "de3aa3a6909f2377a7b0685391732d4f1b980502b1f0d3e229d74e0d8c4c99fd",
    "forward": "d82e05538a636c801cebb62c7e1a80366d23dcd53efa74859cf60cb29d1f0b63",
    "prior": "73044f6ad50ab44e11247e0b0cf8f18d3484ef750beeaf51bb6a0256b4b32925",
    "mcmc": "c5b7589072588e3ad507199d3528aa6820cec5d372f035d529adab070a02437b",
}


def reference_available() -> bool:
    return os.path.isdir(_REF_DIR)


def _make_stubs():
    stubs = {}
    for name in ("pys2let", "pyssht", "healpy"):
        stubs[name] = types.ModuleType(name)
    # the only module-level `from` import of a C symbol in the loaded files
    # (`/root/reference/pxmcmc/forward.py:1`); MW sampling size
    stubs["pys2let"].mw_size = lambda L: L * (2 * L - 1)
    astropy = types.ModuleType("astropy")
    coords = types.ModuleType("astropy.coordinates")
    coords.SkyCoord = type("SkyCoord", (), {})
    astropy.coordinates = coords
    stubs["astropy"] = astropy
    stubs["astropy.coordinates"] = coords
    return stubs


def load_reference():
    """Import the reference package; returns the ``refpxmcmc`` namespace
    (modules as attributes: utils, transforms, measurements, forward,
    prior, mcmc) or None when /root/reference is absent."""
    global _cache
    if _cache is not None:
        return _cache
    if not reference_available():
        return None
    stubs = _make_stubs()
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        pkg = types.ModuleType("refpxmcmc")
        pkg.__path__ = [_REF_DIR]
        sys.modules["refpxmcmc"] = pkg
        for name in ("utils", "transforms", "measurements", "forward", "prior", "mcmc"):
            path = os.path.join(_REF_DIR, name + ".py")
            with open(path, "rb") as fh:
                raw = fh.read()
            digest = hashlib.sha256(raw).hexdigest()
            if digest != _PINNED_SHA256[name]:
                raise RuntimeError(
                    f"reference file {path} does not match its pinned hash "
                    f"({digest} != {_PINNED_SHA256[name]}); refusing to exec "
                    "unreviewed content — re-review and update the pin"
                )
            src = raw.decode()
            # retarget intra-package imports at the private namespace so the
            # reference never shadows this repo's `pxmcmc` compat alias
            src = src.replace("from pxmcmc.", "from refpxmcmc.").replace(
                "import pxmcmc.", "import refpxmcmc."
            )
            mod = types.ModuleType("refpxmcmc." + name)
            mod.__file__ = path
            sys.modules["refpxmcmc." + name] = mod
            setattr(pkg, name, mod)
            exec(compile(src, path, "exec"), mod.__dict__)
        _cache = pkg
        return pkg
    finally:
        # the loaded modules hold direct references to the stub objects;
        # nothing else should see them through sys.modules
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
