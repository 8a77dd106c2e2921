"""Public Suffix List matching for registrable-domain ("eTLD+1") keys.

``operators/web.py::registrable_domain`` ships a public-suffix-LITE pure-JVM
expression (last 2 labels, 3 when the 2nd-level label ∈ a fixed 7-set) —
the right default for the hot path, but real-world hosts under suffixes
outside that set (``nom.br``, ``sch.uk``, ``gob.mx``) mis-key in p71
domain stats and p97 blocklisting (VERDICT r10 missing #3). This module is
the opt-in fix: the FULL publicsuffix.org matching algorithm (longest
rule wins, ``*.`` wildcards match exactly one label, ``!`` exceptions
beat everything — https://publicsuffix.org/list/, the algorithm section)
over a swappable rule list, evaluated as an Arrow-batched pandas UDF with
the rules held once per executor (a broadcast-sized set, not a join side).

``SNAPSHOT_RULES`` is a hand-curated subset of the ICANN section of the
Mozilla Public Suffix List (public knowledge; the full list is ~9k rules
and churns monthly — a deployment pins its own vendored copy and passes it
via ``rules=``). Only MULTI-label rules need listing: the PSL's implicit
``*`` rule already makes every bare TLD a public suffix, which is exactly
the LITE default's 2-label behavior.

Contract notes (kept aligned with the LITE expression so the two paths
are drop-in interchangeable as grouping keys):
- input is a HOST (lowercased by us, trailing dots stripped);
- a host that IS a public suffix passes through whole (the strict spec
  says "no registrable domain"; a NULL grouping key would fold all
  suffix-only hosts into one group, which is worse for the stats/blocklist
  use) — same pass-through the LITE path applies to short hosts;
- IPv4 literals key as the whole address (no registrable domain);
- NULL/blank → NULL.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Hand-curated ICANN-section subset: the widely-registered second/third
# level public suffixes plus the well-known wildcard/exception rules.
# Single-label TLDs are deliberately absent (implicit `*` covers them).
SNAPSHOT_RULES: tuple[str, ...] = (
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "*.sch.uk",
    # Japan: generic second-levels + the 47 prefectures
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "aichi.jp", "akita.jp", "aomori.jp", "chiba.jp", "ehime.jp",
    "fukui.jp", "fukuoka.jp", "fukushima.jp", "gifu.jp", "gunma.jp",
    "hiroshima.jp", "hokkaido.jp", "hyogo.jp", "ibaraki.jp",
    "ishikawa.jp", "iwate.jp", "kagawa.jp", "kagoshima.jp",
    "kanagawa.jp", "kochi.jp", "kumamoto.jp", "kyoto.jp", "mie.jp",
    "miyagi.jp", "miyazaki.jp", "nagano.jp", "nagasaki.jp", "nara.jp",
    "niigata.jp", "oita.jp", "okayama.jp", "okinawa.jp", "osaka.jp",
    "saga.jp", "saitama.jp", "shiga.jp", "shimane.jp", "shizuoka.jp",
    "tochigi.jp", "tokushima.jp", "tokyo.jp", "tottori.jp", "toyama.jp",
    "wakayama.jp", "yamagata.jp", "yamaguchi.jp", "yamanashi.jp",
    # Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au",
    "wa.au",
    # Brazil (registro.br's category second-levels; *.nom.br is personal
    # names at the third level)
    "adv.br", "agr.br", "am.br", "arq.br", "art.br", "ato.br", "bio.br",
    "blog.br", "bmd.br", "cim.br", "cng.br", "cnt.br", "com.br",
    "coop.br", "ecn.br", "eco.br", "edu.br", "emp.br", "eng.br",
    "esp.br", "etc.br", "eti.br", "far.br", "flog.br", "fm.br",
    "fnd.br", "fot.br", "fst.br", "g12.br", "ggf.br", "gov.br",
    "imb.br", "ind.br", "inf.br", "jor.br", "jus.br", "leg.br",
    "lel.br", "mat.br", "med.br", "mil.br", "mus.br", "net.br",
    "*.nom.br", "not.br", "ntr.br", "odo.br", "org.br", "ppg.br",
    "pro.br", "psc.br", "psi.br", "qsl.br", "radio.br", "rec.br",
    "slg.br", "srv.br", "taxi.br", "teo.br", "tmp.br", "trd.br",
    "tur.br", "tv.br", "vet.br", "vlog.br", "wiki.br", "zlg.br",
    # New Zealand
    "ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
    "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
    "org.nz", "parliament.nz", "school.nz",
    # South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "ngo.za", "nom.za", "org.za", "school.za", "web.za",
    # Mexico / Argentina / Chile-style gob
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "musica.ar", "net.ar", "org.ar", "tur.ar",
    "gob.cl", "gov.cl", "mil.cl",
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co", "org.co",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    # India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # China: generics + province codes
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn", "gx.cn",
    "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hl.cn", "hn.cn",
    "jl.cn", "js.cn", "jx.cn", "ln.cn", "nm.cn", "nx.cn", "qh.cn",
    "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn", "tj.cn", "xj.cn",
    "xz.cn", "yn.cn", "zj.cn",
    # Korea
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    # Taiwan / Hong Kong
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    # Israel / Turkey
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr",
    "gen.tr", "gov.tr", "info.tr", "k12.tr", "mil.tr", "name.tr",
    "net.tr", "org.tr", "pol.tr", "tel.tr", "tsk.tr", "tv.tr", "web.tr",
    # Poland / Ukraine / Russia
    "biz.pl", "com.pl", "edu.pl", "info.pl", "net.pl", "org.pl",
    "waw.pl",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua", "net.ua", "org.ua",
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru", "test.ru",
    # Indonesia / Thailand / Singapore / Malaysia / Philippines / Vietnam
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my",
    "org.my",
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    # Kenya / Nigeria / Egypt
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
    "name.ng", "net.ng", "org.ng", "sch.ng",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    # United States: the state second-levels (k12/cc/lib third levels
    # exist in the full list; deployments needing them pass rules=)
    "dni.us", "fed.us", "isa.us", "kids.us", "nsn.us",
    "ak.us", "al.us", "ar.us", "as.us", "az.us", "ca.us", "co.us",
    "ct.us", "dc.us", "de.us", "fl.us", "ga.us", "gu.us", "hi.us",
    "ia.us", "id.us", "il.us", "in.us", "ks.us", "ky.us", "la.us",
    "ma.us", "md.us", "me.us", "mi.us", "mn.us", "mo.us", "ms.us",
    "mt.us", "nc.us", "nd.us", "ne.us", "nh.us", "nj.us", "nm.us",
    "nv.us", "ny.us", "oh.us", "ok.us", "or.us", "pa.us", "pr.us",
    "ri.us", "sc.us", "sd.us", "tn.us", "tx.us", "ut.us", "va.us",
    "vi.us", "vt.us", "wa.us", "wi.us", "wv.us", "wy.us",
    # Wildcard TLDs (all registrations at the second level) + the
    # canonical exception
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.kh", "*.mm", "*.np",
    "*.pg",
)

_IPV4 = re.compile(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")


class _CompiledRules:
    """Rule set preprocessed for O(labels) lookup: exact-suffix set,
    wildcard-parent set (rule '*.ck' stored as 'ck'), exception set
    (rule '!www.ck' stored as 'www.ck'), and the max rule depth."""

    def __init__(self, rules):
        self.exact: set[str] = set()
        self.wild_parent: set[str] = set()
        self.exc: set[str] = set()
        depth = 1
        for r in rules:
            r = r.strip().lower()
            if not r or r.startswith("//"):
                continue
            if r.startswith("!"):
                self.exc.add(r[1:])
                depth = max(depth, r.count("."))  # exception minus 1 label
            elif r.startswith("*."):
                self.wild_parent.add(r[2:])
                depth = max(depth, r.count(".") + 1)
            else:
                self.exact.add(r)
                depth = max(depth, r.count(".") + 1)
        self.max_depth = depth

    def registrable(self, host: str) -> str:
        """publicsuffix.org algorithm, host pre-normalized (lower, no
        trailing dots). Returns the eTLD+1, or the host itself when the
        host IS a public suffix (pass-through contract, see module doc)."""
        labels = host.split(".")
        n = len(labels)
        # exception rules win outright; the public suffix is the rule
        # minus its leftmost label
        for k in range(min(n, self.max_depth + 1), 1, -1):
            if ".".join(labels[n - k:]) in self.exc:
                ps = k - 1
                return ".".join(labels[n - min(n, ps + 1):])
        # otherwise the longest matching rule prevails (implicit '*' = 1)
        ps = 1
        for k in range(min(n, self.max_depth), 1, -1):
            tail = ".".join(labels[n - k:])
            if tail in self.exact or ".".join(labels[n - k + 1:]) in self.wild_parent:
                ps = k
                break
        return ".".join(labels[n - min(n, ps + 1):])


def registrable_domain_psl(
    host: Column, rules: tuple[str, ...] | list[str] | None = None
) -> Column:
    """Full-PSL registrable domain of a host column — the opt-in upgrade
    of ``web.registrable_domain`` (which stays the pure-JVM default).
    ``rules`` defaults to ``SNAPSHOT_RULES``; pass a vendored full PSL
    (one rule per entry, ``//`` comment lines tolerated) to pin the
    complete list. Arrow-batched pandas UDF; the compiled rule set is
    captured in the UDF closure and shipped once per executor (a few
    hundred KB even for the full list). IPv4 literals pass through whole;
    NULL/blank → NULL; trailing dots stripped (ADVICE r8 parity with the
    LITE path)."""
    from pyspark.sql.functions import pandas_udf

    compiled = _CompiledRules(rules if rules is not None else SNAPSHOT_RULES)

    @pandas_udf("string")
    def _reg(s: pd.Series) -> pd.Series:
        def one(h):
            if h is None:
                return None
            h = h.strip().lower().rstrip(".")
            if not h:
                return None
            if _IPV4.match(h):
                return h
            return compiled.registrable(h)

        return s.map(one)

    return _reg(host)
