"""Dependency-free API reference generator.

The reference auto-builds Doxygen docs and publishes them to gh-pages
(/root/reference/.github/workflows/docs.yml, Doxyfile). This is the
counterpart for the Python stack: walk every abc_tpu module, emit one
markdown page per module (module docstring, public classes with method
signatures + docstrings, public functions), plus an index — pure stdlib
(inspect/importlib) so it runs in any environment; the docs workflow
publishes the output to gh-pages.

Usage: python scripts/gen_api_docs.py [out_dir=docs/api]
"""

from __future__ import annotations

import importlib
import inspect
import os
import pkgutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP = {"abc_tpu.parallel.multihost"}   # imports jax.distributed at load


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, indent: str = "") -> str:
    d = inspect.getdoc(obj)
    if not d:
        return ""
    return "\n".join(indent + line for line in d.splitlines())


def _page(modname: str) -> str:
    return modname.replace(".", "_") + ".md"


def _class_link(cls, registry) -> str:
    """Markdown link to a class's page+anchor if it lives in abc_tpu."""
    key = f"{cls.__module__}.{cls.__qualname__}"
    if key in registry:
        return f"[`{cls.__qualname__}`]({_page(cls.__module__)}" \
               f"#class-{cls.__qualname__.lower()})"
    return f"`{cls.__qualname__}`"


def render_module(mod, registry, subclasses) -> str:
    """registry: {qualified class name: class} over all abc_tpu modules;
    subclasses: {qualified name: [subclass...]}. Cross-links inheritance
    both ways — the Doxygen-style relation the round-3 review called out
    as missing from the flat pages."""
    lines = [f"# `{mod.__name__}`", ""]
    if mod.__doc__:
        lines += [inspect.cleandoc(mod.__doc__), ""]
    members = [(n, o) for n, o in vars(mod).items() if not n.startswith("_")]
    classes = [(n, o) for n, o in members
               if inspect.isclass(o) and o.__module__ == mod.__name__]
    funcs = [(n, o) for n, o in members
             if inspect.isfunction(o) and o.__module__ == mod.__name__]
    for name, cls in classes:
        lines += [f"## class `{name}`", ""]
        bases = [b for b in cls.__bases__ if b is not object]
        if bases:
            lines += ["Inherits: " +
                      ", ".join(_class_link(b, registry) for b in bases), ""]
        subs = subclasses.get(f"{cls.__module__}.{cls.__qualname__}", [])
        if subs:
            lines += ["Subclasses: " +
                      ", ".join(_class_link(s, registry) for s in subs), ""]
        d = _doc(cls)
        if d:
            lines += [d, ""]
        for mname, m in sorted(vars(cls).items()):
            if mname.startswith("_") and mname != "__init__":
                continue
            if isinstance(m, property):
                lines += [f"### `{name}.{mname}` *(property)*", ""]
                md = _doc(m.fget) if m.fget else ""
                if md:
                    lines += [md, ""]
                continue
            if inspect.isfunction(m):
                lines += [f"### `{name}.{mname}{_sig(m)}`", ""]
                md = _doc(m)
                if md:
                    lines += [md, ""]
    for name, fn in funcs:
        lines += [f"## `{name}{_sig(fn)}`", ""]
        d = _doc(fn)
        if d:
            lines += [d, ""]
    return "\n".join(lines) + "\n"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "docs/api"
    os.makedirs(out_dir, exist_ok=True)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import abc_tpu

    # pass 1: import everything, build the class registry + subclass map
    mods, pages = [], []
    for info in sorted(pkgutil.walk_packages(abc_tpu.__path__,
                                             prefix="abc_tpu."),
                       key=lambda i: i.name):
        if info.name in SKIP:
            continue
        try:
            mods.append(importlib.import_module(info.name))
        except Exception as exc:      # environment-gated module: note it
            pages.append((info.name, None, str(exc)[:100]))
    registry = {}
    for mod in mods:
        for n, o in vars(mod).items():
            if not n.startswith("_") and inspect.isclass(o) \
                    and o.__module__ == mod.__name__:
                registry[f"{o.__module__}.{o.__qualname__}"] = o
    subclasses = {}
    for cls in registry.values():
        for b in cls.__bases__:
            key = f"{b.__module__}.{b.__qualname__}"
            if key in registry:
                subclasses.setdefault(key, []).append(cls)
    # pass 2: render with cross-links
    for mod in mods:
        fname = _page(mod.__name__)
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(render_module(mod, registry, subclasses))
        first = (inspect.cleandoc(mod.__doc__).splitlines()[0]
                 if mod.__doc__ else "")
        pages.append((mod.__name__, fname, first))
    pages.sort()
    with open(os.path.join(out_dir, "index.md"), "w") as f:
        f.write("# abc_tpu API reference\n\nGenerated by "
                "`scripts/gen_api_docs.py` (published by "
                "`.github/workflows/docs.yml`, the counterpart of the "
                "reference's Doxygen pipeline). Class pages cross-link "
                "inheritance in both directions.\n\n")
        for name, fname, first in pages:
            if fname:
                f.write(f"- [`{name}`]({fname}) — {first}\n")
            else:
                f.write(f"- `{name}` — (not importable here: {first})\n")
        f.write("\n## Class index\n\n")
        for key in sorted(registry, key=lambda k: k.rsplit(".", 1)[-1]):
            cls = registry[key]
            f.write(f"- {_class_link(cls, registry)} — `{cls.__module__}`\n")
    print(f"wrote {len(pages)} module pages to {out_dir}")


if __name__ == "__main__":
    main()
