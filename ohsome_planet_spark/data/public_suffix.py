"""Vendored Public Suffix List snapshot + the PSL matching algorithm.

The Public Suffix List (publicsuffix.org, Mozilla-maintained, MPL-2.0 —
public content) is the canonical answer to "where does the registrable
domain start" — `co.uk`, `com.au`, `github.io`-class suffixes that a
last-two-labels heuristic mis-splits. This module vendors:

* `SUFFIXES_2` / `SUFFIXES_3`: a hand-vendored SNAPSHOT SUBSET of the
  highest-traffic multi-label rules (ICANN country second-levels for the
  major ccTLDs + the dominant private-section hosting suffixes). It is a
  subset, not the full ~9k-line file — this sandbox has no network to
  fetch the canonical copy, and inventing entries would be worse than
  documenting the boundary. Every entry below is a well-known published
  rule.
* `WILDCARD_1` / `EXCEPTIONS_2`: wildcard (`*.ck`) and exception
  (`!www.ck`) rules, implementing the full PSL rule grammar so a complete
  file drops in without code changes.
* `load_psl(path)`: parser for the real `public_suffix_list.dat` format
  (comments, sections, wildcards, exceptions) — THE swap point: on a
  deployed cluster, ship the file and pass `rules=load_psl(...)` to get
  the complete list with identical semantics.

Matching follows the published algorithm: the longest matching rule wins,
an exception rule beats its wildcard, an unlisted TLD's suffix is its last
label, and the registrable domain is the suffix plus one label.
"""

from __future__ import annotations

from dataclasses import dataclass

# ICANN section: country-code second-level registrations (two-label rules).
_ICANN_2 = """
co.uk org.uk me.uk ltd.uk plc.uk net.uk sch.uk ac.uk gov.uk nhs.uk
com.au net.au org.au edu.au gov.au asn.au id.au
co.jp or.jp ne.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp
com.br net.br org.br gov.br edu.br mil.br art.br adv.br
co.nz net.nz org.nz govt.nz ac.nz school.nz gen.nz geek.nz maori.nz
co.za net.za org.za gov.za edu.za ac.za web.za
co.in net.in org.in gen.in firm.in ind.in ac.in edu.in res.in gov.in
com.cn net.cn org.cn gov.cn edu.cn ac.cn
co.kr ne.kr or.kr re.kr go.kr ac.kr pe.kr
com.mx net.mx org.mx gob.mx edu.mx
com.ar net.ar org.ar gob.ar edu.ar
com.tr net.tr org.tr gov.tr edu.tr bel.tr pol.tr k12.tr
com.sg net.sg org.sg gov.sg edu.sg per.sg
com.hk net.hk org.hk gov.hk edu.hk idv.hk
com.tw net.tw org.tw gov.tw edu.tw idv.tw
co.th net.th or.th go.th ac.th in.th
co.id net.id or.id go.id ac.id web.id sch.id my.id biz.id
com.my net.my org.my gov.my edu.my
com.ph net.ph org.ph gov.ph edu.ph
com.vn net.vn org.vn gov.vn edu.vn ac.vn
co.il net.il org.il gov.il ac.il muni.il k12.il
com.ua net.ua org.ua gov.ua edu.ua in.ua
com.pl net.pl org.pl edu.pl gov.pl waw.pl
com.ru net.ru org.ru
com.eg net.eg org.eg gov.eg edu.eg
com.sa net.sa org.sa gov.sa edu.sa med.sa sch.sa
co.ae net.ae org.ae gov.ae ac.ae sch.ae mil.ae
com.ng net.ng org.ng gov.ng edu.ng
co.ke or.ke go.ke ac.ke ne.ke sc.ke info.ke me.ke mobi.ke
com.pk net.pk org.pk gov.pk edu.pk
com.bd net.bd org.bd gov.bd edu.bd
co.ve com.ve net.ve org.ve gob.ve edu.ve
com.co net.co org.co gov.co edu.co
com.pe net.pe org.pe gob.pe edu.pe
com.ec net.ec org.ec gob.ec edu.ec
com.uy net.uy org.uy gub.uy edu.uy
com.py net.py org.py gov.py edu.py
com.bo net.bo org.bo gob.bo edu.bo
co.cr com.gt com.sv com.ni com.pa com.do com.pr
com.gr net.gr org.gr gov.gr edu.gr
com.pt net.pt org.pt gov.pt edu.pt
co.at or.at ac.at gv.at
co.hu org.hu
com.es nom.es org.es gob.es edu.es
com.se org.se
co.no priv.no
com.cy org.cy gov.cy
com.mt org.mt gov.mt edu.mt
com.lb net.lb org.lb gov.lb edu.lb
com.jo net.jo org.jo gov.jo edu.jo
com.kw net.kw org.kw gov.kw edu.kw
com.qa net.qa org.qa gov.qa edu.qa
com.bh net.bh org.bh gov.bh edu.bh
com.om net.om org.om gov.om edu.om
"""

# Private section: hosting platforms whose customers get their own
# registrable subdomain (changes dedup/blocklist grouping materially).
_PRIVATE_2 = """
github.io gitlab.io blogspot.com wordpress.com herokuapp.com netlify.app
vercel.app pages.dev web.app firebaseapp.com appspot.com cloudfront.net
azurewebsites.net fastly.net readthedocs.io neocities.org tumblr.com
"""

_PRIVATE_3 = """
s3.amazonaws.com
"""

SUFFIXES_2: frozenset[str] = frozenset(
    (_ICANN_2 + _PRIVATE_2).split()
)
SUFFIXES_3: frozenset[str] = frozenset(_PRIVATE_3.split())
# "*.ck" — every 2-label suffix under .ck, with the published exception
WILDCARD_1: frozenset[str] = frozenset({"ck"})
EXCEPTIONS_2: frozenset[str] = frozenset({"www.ck"})


@dataclass(frozen=True)
class PslRules:
    suffixes_2: frozenset = SUFFIXES_2
    suffixes_3: frozenset = SUFFIXES_3
    wildcard_1: frozenset = WILDCARD_1
    exceptions_2: frozenset = EXCEPTIONS_2


SNAPSHOT = PslRules()


def load_psl(path: str) -> PslRules:
    """Parse a real `public_suffix_list.dat` into PslRules.

    Handles comments (`//`), blank lines, exception rules (`!`), and
    wildcard rules (`*.`). Rules longer than 3 labels (a handful of
    `*.compute.amazonaws.com`-class entries) are truncated to their last 3
    labels — a documented approximation of this engine's 3-label matcher.
    """
    s2, s3, w1, e2 = set(), set(), set(), set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            if line.startswith("!"):
                e2.add(".".join(line[1:].split(".")[-2:]))
                continue
            if line.startswith("*."):
                w1.add(".".join(line[2:].split(".")[-1:]))
                continue
            labels = line.split(".")
            if len(labels) == 2:
                s2.add(line)
            elif len(labels) >= 3:
                s3.add(".".join(labels[-3:]))
    return PslRules(frozenset(s2), frozenset(s3), frozenset(w1), frozenset(e2))


def registered_domain_py(host: str, rules: PslRules = SNAPSHOT) -> str:
    """Reference (python) implementation of the matcher — the unit-test
    twin of the Column expression in operators/urls.py."""
    labels = host.lower().split(".")
    n = len(labels)
    last1 = labels[-1]
    last2 = ".".join(labels[-2:]) if n >= 2 else host
    last3 = ".".join(labels[-3:]) if n >= 3 else None
    if last3 is not None and last3 in rules.suffixes_3:
        suffix_len = 3
    elif n >= 2 and last2 in rules.exceptions_2:
        suffix_len = 1  # exception: the rule itself is registrable
    elif n >= 2 and (last2 in rules.suffixes_2 or last1 in rules.wildcard_1):
        suffix_len = 2
    else:
        suffix_len = 1
    if n <= suffix_len:
        return host.lower()
    return ".".join(labels[-(suffix_len + 1):])
