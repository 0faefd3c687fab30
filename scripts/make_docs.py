"""Generate API documentation (the reference ships a Doxygen build,
reference: Doxyfile + README.md:174-181; this is the stdlib equivalent).

Writes pydoc HTML for every package module into docs/api/.
"""

import os
import pydoc
import pkgutil
import sys

sys.path.insert(0, ".")

import opengl_raytracing_tpu as pkg  # noqa: E402

OUT = os.path.join("docs", "api")


def main():
    os.makedirs(OUT, exist_ok=True)
    names = ["opengl_raytracing_tpu"]
    for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        names.append(m.name)
    cwd = os.getcwd()
    os.chdir(OUT)
    try:
        ok = 0
        for name in names:
            try:
                pydoc.writedoc(name)
                ok += 1
            except Exception as exc:  # document what we can
                print(f"skip {name}: {exc}")
        print(f"wrote {ok}/{len(names)} module docs to {OUT}/")
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
