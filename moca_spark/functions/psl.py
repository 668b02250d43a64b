"""Public-suffix-list (effective-TLD) resolution.

The reference resolves ``domain`` = eTLD+1 via crawler-commons'
``EffectiveTldFinder`` backed by Mozilla's public suffix list
(reference: url/Url.scala:25-26, build.sbt:20). This module implements
the same PSL *algorithm* (longest matching rule; ``*.`` wildcards;
``!`` exceptions; unknown TLDs fall back to the last label) over an
embedded snapshot of common suffixes. The snapshot is deliberately
small — enough for the reference's own test cases (``gov.br``) and any
synthetic fixture hosts. Since round 5 the FULL Mozilla list ships as
``public_suffix_list.dat`` next to this file (read via
importlib.resources so it resolves both from a source tree and from
the ``--py-files`` zip on executors — session.ship_package includes
``.dat``); the embedded subset remains the fallback if the file is
removed.

Pure Python, driver- and executor-safe, used inside the vectorized
``domain`` pandas UDF (functions/urls.py).
"""

from __future__ import annotations

import os
from functools import lru_cache

# Representative snapshot of the Mozilla PSL (rules, not exhaustive).
_EMBEDDED_RULES = """
com net org edu gov mil int info biz name pro aero coop museum
io co ai app dev xyz site online tech store blog cloud me tv cc ws
us uk de fr nl it es pt se no fi dk pl cz ch at be ie gr hu ro
ru ua jp cn kr in au nz ca mx ar cl pe ve za eg ng ke ma br test
local localhost example invalid
co.uk org.uk ac.uk gov.uk me.uk net.uk plc.uk ltd.uk sch.uk
com.au net.au org.au edu.au gov.au id.au asn.au
co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz maori.nz
co.jp ne.jp or.jp go.jp ac.jp ad.jp ed.jp gr.jp lg.jp
com.cn net.cn org.cn gov.cn edu.cn ac.cn
co.in net.in org.in gen.in firm.in ind.in nic.in ac.in edu.in res.in gov.in mil.in
com.br net.br org.br gov.br edu.br mil.br art.br adv.br blog.br eco.br
com.mx net.mx org.mx gob.mx edu.mx
com.ar net.ar org.ar gob.ar edu.ar
co.za net.za org.za gov.za ac.za web.za
com.sg net.sg org.sg gov.sg edu.sg per.sg
com.hk net.hk org.hk gov.hk edu.hk idv.hk
com.tw net.tw org.tw gov.tw edu.tw idv.tw
co.kr ne.kr or.kr go.kr ac.kr re.kr pe.kr
com.tr net.tr org.tr gov.tr edu.tr
co.il net.il org.il gov.il ac.il muni.il
com.ua net.ua org.ua gov.ua edu.ua in.ua
com.ru net.ru org.ru msk.ru spb.ru
gouv.fr asso.fr nom.fr prd.fr tm.fr
co.it edu.it gov.it
*.ck !www.ck
*.bd *.kw *.er *.fk *.mm *.np
blogspot.com github.io gitlab.io herokuapp.com appspot.com
cloudfront.net amazonaws.com s3.amazonaws.com azurewebsites.net
""".split()


def _read_full_list() -> str | None:
    """The full Mozilla list, from the source tree OR the --py-files
    zip (importlib.resources goes through the package loader, which
    zipimport implements); None if the file was removed."""
    try:
        from importlib import resources

        ref = resources.files(__package__).joinpath("public_suffix_list.dat")
        if ref.is_file():
            return ref.read_text(encoding="utf-8")
    except Exception:
        pass
    full = os.path.join(os.path.dirname(__file__), "public_suffix_list.dat")
    if os.path.exists(full):
        with open(full, encoding="utf-8") as f:
            return f.read()
    return None


@lru_cache(maxsize=1)
def _load_rules() -> tuple[set[str], set[str], set[str]]:
    """Return (exact_rules, wildcard_bases, exception_rules)."""
    rules = list(_EMBEDDED_RULES)
    full_text = _read_full_list()
    if full_text is not None:
        for line in full_text.splitlines():
            line = line.strip()
            if line and not line.startswith("//"):
                rules.append(line)
    exact, wildcard, exception = set(), set(), set()
    for r in rules:
        if r.startswith("!"):
            exception.add(r[1:])
        elif r.startswith("*."):
            wildcard.add(r[2:])
        else:
            exact.add(r)
    return exact, wildcard, exception


def public_suffix(host: str) -> str:
    """Longest matching public suffix of ``host`` (PSL algorithm)."""
    exact, wildcard, exception = _load_rules()
    labels = host.lower().rstrip(".").split(".")
    for i in range(len(labels)):
        cand = ".".join(labels[i:])
        if cand in exception:
            # exception rule: suffix is one label shorter
            return ".".join(labels[i + 1 :])
        if cand in exact:
            return cand
        # wildcard *.base matches exactly one extra label
        if i + 1 < len(labels) and ".".join(labels[i + 1 :]) in wildcard:
            return cand
    return labels[-1]  # unknown TLD: last label (PSL default rule)


def effective_domain(host: str) -> str:
    """eTLD+1, mirroring crawler-commons getAssignedDomain (Url.scala:25-26).

    If the host IS a public suffix (or an IP/single label), return it as-is.
    """
    if not host:
        return host
    host = host.lower().rstrip(".")
    if _looks_like_ip(host):
        return host
    suffix = public_suffix(host)
    if host == suffix:
        return host
    prefix = host[: -(len(suffix) + 1)]
    return prefix.rsplit(".", 1)[-1] + "." + suffix


def _looks_like_ip(host: str) -> bool:
    parts = host.split(".")
    return len(parts) == 4 and all(p.isdigit() and int(p) < 256 for p in parts)
