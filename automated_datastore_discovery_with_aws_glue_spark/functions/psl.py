"""Bundled public-suffix fixture for eTLD+1 extraction.

A few hundred EXACT rules drawn from the well-known public suffix
registry (the Mozilla-maintained list every browser and crawler keys
cookies and registrable domains on): the high-traffic ccTLD
second-level registrations (``com.ar``, ``co.za``, ``com.br``, ...)
plus the common "private" hosting suffixes (``github.io``,
``blogspot.com``, ...) whose subdomains belong to unrelated parties
and must therefore count as separate registrable domains for
blocklists and per-domain caps.

All three registry rule forms are interpreted (r12): EXACT rules,
WILDCARD rules (``*.ck`` — every single label under ``ck`` is a
public suffix), and EXCEPTION rules (``!www.ck`` — carved back OUT of
a wildcard: ``www.ck`` is itself a registrable domain). Exceptions
beat wildcards beat shorter exact matches, per the registry's
published algorithm. Swap in the full registry by passing your own
rule tuple to ``operators.web.registered_domain_join`` — the operator
is one broadcast join per rule form and depth, so table size is a
broadcast-size question, not a plan-shape one.

Single-label TLDs are deliberately ABSENT: with no deeper match the
operator already defaults to the last two labels, which is exactly
the eTLD+1 under a single-label suffix.
"""

from __future__ import annotations

#: exact public-suffix rules, grouped here by region/registry purely
#: for review-ability; the operator only sees the flat tuple
PUBLIC_SUFFIXES: tuple[str, ...] = (
    # -- United Kingdom / Ireland
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # -- Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz",
    # -- Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    # -- South Korea / China / Taiwan / Hong Kong
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr", "busan.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    # -- South / Southeast Asia
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "name.my",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph",
    "co.id", "or.id", "ac.id", "sch.id", "go.id", "web.id", "my.id",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "biz.vn",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd",
    "com.np", "net.np", "org.np", "edu.np", "gov.np",
    "com.lk", "org.lk", "edu.lk", "gov.lk", "web.lk",
    # -- Middle East / Africa
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "bel.tr",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "ac.ae", "co.ae", "net.ae", "org.ae", "sch.ae", "gov.ae",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "co.za", "net.za", "org.za", "web.za", "ac.za", "gov.za", "edu.za",
    "co.ke", "or.ke", "ne.ke", "ac.ke", "go.ke", "sc.ke", "me.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "sch.ng",
    "co.tz", "or.tz", "ne.tz", "ac.tz", "go.tz", "sc.tz",
    "co.ug", "or.ug", "ne.ug", "ac.ug", "go.ug", "sc.ug",
    "co.zw", "org.zw", "ac.zw", "gov.zw",
    "co.ma", "net.ma", "org.ma", "ac.ma", "gov.ma", "press.ma",
    # -- Latin America
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
    "musica.ar", "tur.ar",
    "com.br", "net.br", "org.br", "edu.br", "gov.br", "art.br",
    "blog.br", "dev.br", "eco.br", "esp.br", "etc.br", "far.br",
    "flog.br", "ind.br", "inf.br", "jus.br", "leg.br", "mil.br",
    "psi.br", "rec.br", "srv.br", "tec.br", "tv.br", "wiki.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "web.ve",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "med.ec",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "web.bo",
    "com.py", "net.py", "org.py", "edu.py", "gov.py", "coop.py",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "ind.gt",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "web.do",
    "com.sv", "org.sv", "edu.sv", "gob.sv", "red.sv",
    "com.ni", "net.ni", "org.ni", "edu.ni", "gob.ni", "co.ni",
    "co.cr", "fi.cr", "go.cr", "or.cr", "sa.cr", "ed.cr", "ac.cr",
    "com.pa", "net.pa", "org.pa", "edu.pa", "gob.pa", "ing.pa",
    "co.cl", "gob.cl", "gov.cl", "mil.cl",
    # -- Europe (ccTLDs with active second-level registries)
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "wroc.pl", "krakow.pl", "poznan.pl", "lodz.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "kiev.ua", "kyiv.ua", "lviv.ua", "odesa.ua", "kharkiv.ua",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "publ.pt",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "co.rs", "org.rs", "edu.rs", "in.rs", "ac.rs", "gov.rs",
    "com.mt", "net.mt", "org.mt", "edu.mt", "gov.mt",
    "com.cy", "net.cy", "org.cy", "ekloges.cy", "ltd.cy", "biz.cy",
    "co.im", "net.im", "org.im", "ac.im", "com.im", "ltd.co.im",
    "co.gg", "net.gg", "org.gg", "co.je", "net.je", "org.je",
    # -- North America / misc
    "co.us", "com.mm", "net.mm", "org.mm", "edu.mm", "gov.mm",
    # three-label exact rules (US K-12 and city registries)
    "k12.ak.us", "k12.al.us", "k12.ar.us", "k12.az.us", "k12.ca.us",
    "k12.co.us", "k12.ct.us", "k12.dc.us", "k12.de.us", "k12.fl.us",
    "k12.ga.us", "k12.ia.us", "k12.id.us", "k12.il.us", "k12.in.us",
    "k12.ks.us", "k12.ky.us", "k12.la.us", "k12.ma.us", "k12.md.us",
    "k12.me.us", "k12.mi.us", "k12.mn.us", "k12.mo.us", "k12.ms.us",
    "cc.ca.us", "cc.co.us", "cc.fl.us", "cc.il.us", "cc.md.us",
    "lib.ca.us", "lib.co.us", "lib.fl.us", "lib.il.us", "lib.md.us",
    # -- common private hosting suffixes (subdomains are third parties)
    "github.io", "githubusercontent.com", "gitlab.io", "gitpage.si",
    "blogspot.com", "blogspot.co.uk", "blogspot.com.br", "blogspot.de",
    "blogspot.fr", "blogspot.in", "blogspot.jp", "blogspot.mx",
    "wordpress.com", "wpengine.com", "tumblr.com", "weebly.com",
    "netlify.app", "vercel.app", "pages.dev", "web.app", "firebaseapp.com",
    "herokuapp.com", "appspot.com", "fly.dev", "onrender.com",
    "surge.sh", "neocities.org", "readthedocs.io", "hashnode.dev",
    "fastly.net", "cloudfront.net", "azurewebsites.net", "cloudapp.net",
    "dreamhosters.com", "duckdns.org", "dyndns.org", "no-ip.org",
    "repl.co", "glitch.me", "codeberg.page", "deno.dev", "workers.dev",
    # -- wildcard rules: any single label under these is a suffix
    "*.bd", "*.ck", "*.er", "*.fk", "*.kh", "*.mm", "*.pg",
    "*.sch.uk",
    # -- exception rules: carved back out of the wildcards above
    "!www.ck",
)
