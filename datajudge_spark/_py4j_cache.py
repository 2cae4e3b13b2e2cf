"""Py4j name-resolution caching for the driver hot path.

Every PySpark ``F.<builtin>(...)`` call costs THREE py4j round-trips on
the classic (non-Connect) path, measured at ~0.1 ms each on this box:

1. ``jvm.functions`` — ``JVMView.__getattr__`` sends a
   ``REFL_GET_UNKNOWN`` command and builds a fresh :class:`JavaClass`;
2. ``getattr(functions, name)`` — ``JavaClass.__getattr__`` sends a
   ``REFL_GET_MEMBER`` command and builds a fresh static
   :class:`JavaMember`;
3. the actual method invocation.

Steps 1 and 2 are pure NAME RESOLUTION of immutable JVM entities
(classes and static-method handles): resolving them once per gateway is
semantically identical to resolving them per call — py4j itself caches
method members per ``JavaObject`` instance for the same reason.  A
suite that issues ~10^5 driver API calls per pass spends tens of
seconds in these two commands alone (profiled: 12k socket round-trips
for a 3k-call ``F.col(...).cast(...)`` loop, 2/3 of them resolution).

This module memoizes both lookups:

- ``JVMView.__getattr__`` results (``JavaClass`` / ``JavaPackage``);
- ``JavaClass.__getattr__`` results when they are static methods or
  nested classes.  Static FIELD reads are deliberately NOT cached (a
  field's value is data, not a name binding).

Caches are keyed by the live view/class object through a
``WeakKeyDictionary``, so a stopped-and-relaunched gateway (new JVMView
/ JavaClass instances) never sees stale members, and entries die with
their owner.  Sharing a ``JavaMember`` across threads is safe: its
state is the precomputed command header, and the gateway client pools
connections per thread (py4j's own per-object method cache already
shares members the same way).
"""

from __future__ import annotations

import weakref

__all__ = ["install_py4j_name_cache"]

_installed = False


def install_py4j_name_cache() -> None:
    global _installed
    if _installed:
        return
    _installed = True

    from py4j.java_gateway import JavaClass, JavaMember, JavaPackage, JVMView

    view_caches: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
    orig_view_getattr = JVMView.__getattr__

    def view_getattr(self, name):
        try:
            cache = view_caches[self]
        except KeyError:
            cache = view_caches[self] = {}
        hit = cache.get(name)
        if hit is None:
            hit = orig_view_getattr(self, name)
            if isinstance(hit, (JavaClass, JavaPackage)):
                cache[name] = hit
        return hit

    JVMView.__getattr__ = view_getattr

    class_caches: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
    orig_class_getattr = JavaClass.__getattr__

    def class_getattr(self, name):
        try:
            cache = class_caches[self]
        except KeyError:
            cache = class_caches[self] = {}
        hit = cache.get(name)
        if hit is None:
            hit = orig_class_getattr(self, name)
            # static methods and nested classes are immutable name
            # bindings; static field VALUES are data and stay uncached
            if isinstance(hit, (JavaMember, JavaClass)):
                cache[name] = hit
        return hit

    JavaClass.__getattr__ = class_getattr
