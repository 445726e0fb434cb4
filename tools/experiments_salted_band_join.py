"""Prototype A/B: uncapped contracted band join vs occupancy-gated salted
variant. Isolates the REP-pair join stage (the skew site); the member
expansion downstream is output-inherent and identical."""
import sys, time, json
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from ubdc_airbnb_spark.session import get_spark
from ubdc_airbnb_spark.functions.psql import psql
from ubdc_airbnb_spark.operators.dedup import (
    _band_key_terms, _digest_groups, _sig_exprs, _contracted_band_join)

K = 8          # salt factor for hot buckets
H = 500        # member-weighted occupancy threshold

def _checksum(df):
    return df.agg(F.bit_xor(F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))))

def salted_pairs(g):
    toks_sql, hv_sql, sig_sql = _sig_exprs("`__text`", 16, 3, "word")
    band_terms = ",".join(_band_key_terms(16, 4))
    def band_eq(j):
        return f"(a.__bkeys[{j}] <=> b.__bkeys[{j}])"
    first_match = ("CASE a.band_id WHEN 0 THEN true " +
        " ".join(f"WHEN {k} THEN NOT ({' OR '.join(band_eq(j) for j in range(k))})" for k in range(1,4)) + " END")
    return psql(f"""
        WITH toksed AS (SELECT __vid, __mids, __text, {toks_sql} AS __toks FROM {{g}}),
        base AS (SELECT __vid, __mids, {hv_sql} AS hv FROM toksed),
        sigd AS (SELECT __vid, __mids, {sig_sql} AS sig FROM base),
        bk AS (SELECT __vid, __mids, array({band_terms}) AS __bkeys FROM sigd),
        banded AS (SELECT __vid, __mids, __bkeys, posexplode(__bkeys) AS (band_id, band_key) FROM bk),
        occ AS (SELECT *, SUM(size(__mids)) OVER (PARTITION BY band_id, band_key) AS __occ FROM banded),
        asalt AS (SELECT *, CASE WHEN __occ > {H} THEN CAST(pmod(xxhash64(__vid), {K}) AS INT) ELSE 0 END AS __salt FROM occ),
        bsalt AS (SELECT *, explode(CASE WHEN __occ > {H} THEN sequence(0, {K-1}) ELSE array(0) END) AS __salt FROM occ)
        SELECT /*+ SHUFFLE_HASH(a, b) */ a.__vid AS vid_a, b.__vid AS vid_b,
               a.__mids AS __ma, b.__mids AS __mb
        FROM asalt a JOIN bsalt b
          ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.__salt = b.__salt
         AND a.__vid < b.__vid AND {first_match}
        """, g=g)

sf = sys.argv[1] if len(sys.argv) > 1 else '/tmp/adv_sf1'
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = get_spark('ab-salt', shuffle_partitions=32,
                  extra_conf={'spark.sql.adaptive.enabled': 'false'})
docs = spark.read.parquet(f'{sf}/documents.parquet')
variants = {
    'current': lambda: _contracted_band_join(_digest_groups(docs, 'doc_id', 'text', None), 16, 4, 3, 'word')[0],
    'salted':  lambda: salted_pairs(_digest_groups(docs, 'doc_id', 'text', None)),
}
sel = lambda df: df.selectExpr('vid_a', 'vid_b', 'size(__ma) AS ma', 'size(__mb) AS mb')
cks = {k: _checksum(sel(fn())).collect()[0][0] for k, fn in variants.items()}
print('checksums', cks, 'equal:', len(set(cks.values())) == 1)
series = {k: [] for k in variants}
for _ in range(rounds):
    for k, fn in variants.items():
        t0 = time.perf_counter()
        sel(fn()).write.format('noop').mode('overwrite').save()
        series[k].append(round(time.perf_counter() - t0, 3))
print(json.dumps({'sf': sf, 'K': K, 'H': H,
                  'best': {k: min(v) for k, v in series.items()}, 'series': series}))
