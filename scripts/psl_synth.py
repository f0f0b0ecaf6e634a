"""Synthetic public-suffix list + reference resolver (VERDICT r9 #4).

The real Mozilla PSL is ~9k rules, depth 1-5, with a few dozen
wildcard rules and ~a dozen exception rules. Network access is blocked
in this container, so scale/correctness work uses a deterministic
synthetic list with the same shape — same grammar, same depth
distribution — generated from a seed.

Also provides ``ref_registered_domain``: a direct, driver-side Python
transcription of the publicsuffix.org algorithm (longest matching
rule wins; exception rules prevail and their own labels are the
registered domain; a host equal to a public suffix has none; unmatched
hosts fall back to the implicit '*' rule). It shares no code with the
Spark implementation in operators/urlops.py, so disagreement between
the two on random hosts is a real finding, not a mirrored bug.
"""

from __future__ import annotations

import random

# rough shape of the real list: mass at depth 2, thin tail to depth 5
DEPTH_WEIGHTS = {1: 1500, 2: 5400, 3: 1600, 4: 350, 5: 60}
N_WILDCARD = 40
N_EXCEPTION = 12

_SYL = [
    "ac", "co", "com", "net", "org", "gov", "edu", "mil", "biz", "info",
    "alpha", "beta", "gamma", "delta", "kilo", "lima", "mike", "nova",
    "omni", "park", "quad", "rex", "sol", "tera", "ursa", "vega", "wave",
    "xen", "york", "zed",
]


def make_psl(seed: int = 20260815, n_rules: int | None = None) -> list[str]:
    """Deterministic synthetic PSL in the list's own grammar."""
    rnd = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    tlds = [f"{a}{b}{c}" for a in "st" for b in alpha for c in alpha]
    rules: set[str] = set(tlds[: DEPTH_WEIGHTS[1]])
    for depth, want in DEPTH_WEIGHTS.items():
        if depth == 1:
            continue
        while sum(1 for r in rules if r.count(".") == depth - 1) < want:
            labs = [rnd.choice(_SYL) for _ in range(depth - 1)]
            rules.add(".".join(labs + [rnd.choice(tlds)]))
    # wildcard rules over fresh bases, each with 0-1 exception carve-outs
    wild_bases = []
    while len(wild_bases) < N_WILDCARD:
        base = f"{rnd.choice(_SYL)}w{len(wild_bases)}.{rnd.choice(tlds)}"
        wild_bases.append(base)
        rules.add(f"*.{base}")
    for base in rnd.sample(wild_bases, N_EXCEPTION):
        rules.add(f"!ok{rnd.choice(_SYL)}.{base}")
    out = sorted(rules)
    if n_rules is not None:
        keep = set(rnd.sample(range(len(out)), min(n_rules, len(out))))
        out = [r for i, r in enumerate(out) if i in keep]
    return out


def make_hosts(rules: list[str], n: int, seed: int = 7) -> list[str | None]:
    """Hosts that exercise every rule class: below-rule hosts (registered
    domain exists), suffix-equal hosts (NULL), deeper subdomains,
    wildcard/exception paths, unlisted TLDs, IPs, NULLs."""
    rnd = random.Random(seed)
    plain = [r for r in rules if not r.startswith(("*", "!"))]
    wild = [r[2:] for r in rules if r.startswith("*.")]
    exc = [r[1:] for r in rules if r.startswith("!")]
    out: list[str | None] = []
    while len(out) < n:
        roll = rnd.random()
        if roll < 0.35:
            out.append(f"{rnd.choice(_SYL)}.{rnd.choice(plain)}")
        elif roll < 0.50:
            out.append(f"{rnd.choice(_SYL)}.{rnd.choice(_SYL)}."
                       f"{rnd.choice(plain)}")
        elif roll < 0.60:
            out.append(rnd.choice(plain))  # suffix-equal -> NULL
        elif roll < 0.70:
            out.append(f"{rnd.choice(_SYL)}.{rnd.choice(wild)}")
        elif roll < 0.76:
            base = rnd.choice(wild)
            out.append(f"{rnd.choice(_SYL)}.{rnd.choice(_SYL)}.{base}")
        elif roll < 0.82 and exc:
            e = rnd.choice(exc)
            out.append(e if rnd.random() < 0.5 else f"sub.{e}")
        elif roll < 0.92:
            out.append(f"{rnd.choice(_SYL)}.{rnd.choice(_SYL)}.unlisted"
                       f"{rnd.randrange(50)}")
        elif roll < 0.96:
            out.append(f"10.0.{rnd.randrange(256)}.{rnd.randrange(256)}")
        else:
            out.append(None)
    return out


def _is_ipv4(host: str) -> bool:
    parts = host.split(".")
    return len(parts) == 4 and all(
        p.isdigit() and int(p) <= 255 for p in parts
    )


def ref_registered_domain(host: str | None, rules: list[str]) -> str | None:
    """publicsuffix.org algorithm, straight Python (see module doc)."""
    if host is None or host == "":
        return None
    if _is_ipv4(host) or (host.startswith("[") and host.endswith("]")):
        return host
    labels = host.split(".")
    exception: list[str] | None = None
    best = 0
    matched = False
    for rule in rules:
        neg = rule.startswith("!")
        r = rule[1:] if neg else rule
        rl = r.split(".")
        if len(rl) > len(labels):
            continue
        tail = labels[-len(rl):]
        if not all(rp == "*" or rp == lp for rp, lp in zip(rl, tail)):
            continue
        if neg:
            if exception is None or len(rl) > len(exception):
                exception = rl
        else:
            matched = True
            best = max(best, len(rl))
    if exception is not None:
        # prevailing exception: drop its leftmost label to get the
        # public suffix, so the exception's own labels ARE the domain
        return ".".join(labels[-len(exception):])
    if matched:
        if len(labels) > best:
            return ".".join(labels[-(best + 1):])
        return None  # host IS a public suffix
    # implicit '*' rule: unlisted TLD keeps two labels
    if len(labels) <= 2:
        return host
    return ".".join(labels[-2:])
