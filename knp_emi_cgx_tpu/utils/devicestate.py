"""Device-array bundling: pass arrays as jit ARGUMENTS, never closure
constants.

On the axon TPU runtime (and generally with large jit-embedded constants),
closure-captured arrays are materialised as executable constants and re-shipped
to the device on every execution (~12 ms per 5 MB array through the tunnel),
while argument arrays stay resident.  The hot step function therefore takes a
pytree bundle of every device array (assembler structures, preconditioner
hierarchies, scatter maps) as an explicit argument.

`collect` extracts named attributes into a dict; `install` swaps them in
(used at trace time so the traced graph references the argument tracers) and
returns the originals for restoration after tracing.
"""
from __future__ import annotations


def collect(obj, names):
    out = {}
    for n in names:
        v = getattr(obj, n, None)
        if v is not None:
            out[n] = v
    return out


def install(obj, d):
    old = {}
    for n, v in d.items():
        old[n] = getattr(obj, n)
        setattr(obj, n, v)
    return old
