"""Probe driver-style hash mismatches: emulate a pandas-based
sort-columns/sort-rows/hash pipeline and report the first byte-level
difference between the Spark parquet output and the DuckDB oracle."""
import duckdb, json, glob, os, sys
import numpy as np
import pandas as pd

outdir = sys.argv[1]
sf = sys.argv[2]
names = sys.argv[3].split(',') if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in glob.glob(sf + '/*.parquet'):
    con.execute(f"CREATE VIEW {os.path.basename(f).replace('.parquet','')} AS SELECT * FROM read_parquet('{f}')")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(df):
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df

for name in sorted(names or oracles):
    if name not in oracles:
        print(name, 'NO ORACLE'); continue
    odf = con.execute(oracles[name]).fetchdf()
    mdf = pd.read_parquet(f'{outdir}/{name}')
    try:
        o, m = canon(odf), canon(mdf)
    except Exception as e:
        print(name, 'SORT ERR', type(e).__name__, e); continue
    print(f'== {name}: {len(o)} rows')
    print('   oracle dtypes:', dict(o.dtypes.astype(str)))
    print('   spark  dtypes:', dict(m.dtypes.astype(str)))
    # driver-like hash
    import hashlib
    def h(df):
        try:
            return hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()
        except Exception as e:
            return f'HASH_ERR {e}'
    ho, hm = h(o), h(m)
    print('   hash_pandas:', ho, hm, 'MATCH' if ho == hm else 'DIFF')
    # csv-style hash
    def hcsv(df):
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()
    co, cm = hcsv(o), hcsv(m)
    print('   csv hash  :', co, cm, 'MATCH' if co == cm else 'DIFF')
    # per-column forensics
    for c in o.columns:
        a, b = o[c], m[c]
        if str(a.dtype) != str(b.dtype):
            print(f'   col {c}: DTYPE {a.dtype} vs {b.dtype}')
        if a.dtype.kind == 'f' and b.dtype.kind == 'f':
            av, bv = a.values, b.values
            neq_bits = av.astype(np.float64).tobytes() != bv.astype(np.float64).tobytes()
            if neq_bits:
                bad = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
                negz_a = (av == 0) & (np.signbit(av))
                negz_b = (bv == 0) & (np.signbit(bv))
                print(f'   col {c}: BITS DIFF; value-neq={bad.sum()}, -0.0 oracle={negz_a.sum()} spark={negz_b.sum()}, NaN oracle={np.isnan(av).sum()} spark={np.isnan(bv).sum()}')
                if bad.any():
                    i = np.argmax(bad)
                    print(f'      first value diff row {i}: {av[i]!r} vs {bv[i]!r}')
        elif a.dtype == object or b.dtype == object:
            sa, sb = a.astype(str), b.astype(str)
            if not sa.equals(sb):
                bad = (sa != sb).values
                i = np.argmax(bad)
                print(f'   col {c}: OBJ DIFF n={bad.sum()} first row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}')
        else:
            if not a.equals(b):
                bad = (a != b).values
                i = np.argmax(bad)
                print(f'   col {c}: DIFF n={bad.sum()} first row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}')
