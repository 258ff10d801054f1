import duckdb, json, glob, os, sys
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for f in glob.glob(sf + '/*.parquet'):
    con.execute(f"CREATE VIEW {os.path.basename(f).replace('.parquet','')} AS SELECT * FROM read_parquet('{f}')")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))
fails = []
for name in sorted(oracles):
    try:
        odf = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(name, 'SQL ERR', e); fails.append(name); continue
    try:
        mine = pd.read_parquet(f'{outdir}/{name}')
    except Exception as e:
        print(name, 'MISSING OUTPUT', e); fails.append(name); continue
    o = odf[sorted(odf.columns)]; m = mine[sorted(mine.columns)]
    ok = list(o.columns) == list(m.columns) and len(o) == len(m)
    if not ok:
        print(name, 'SHAPE', list(o.columns), len(o), 'vs', list(m.columns), len(m))
    else:
        def norm(df):
            df = df.copy()
            for c in df.columns:
                if df[c].dtype == object:
                    df[c] = df[c].apply(lambda x: tuple(x) if hasattr(x, '__len__') and not isinstance(x, str) else x)
            return df.sort_values(list(df.columns)).reset_index(drop=True)
        on, mn = norm(o), norm(m)
        for c in on.columns:
            a, b = on[c], mn[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                av, bv = a.astype(float), b.astype(float)
                bad = ~((av == bv) | (av.isna() & bv.isna()))
                if bad.any():
                    ok = False
                    print(name, c, bad.sum(), 'diffs e.g.', av[bad].iloc[0], 'vs', bv[bad].iloc[0])
            else:
                sa, sb = a.astype(str), b.astype(str)
                if not sa.equals(sb):
                    bad = sa != sb
                    ok = False
                    print(name, c, bad.sum(), 'diffs e.g.', repr(a[bad].iloc[0]), 'vs', repr(b[bad].iloc[0]))
    if not ok:
        fails.append(name)
# rows-only queries: assert non-empty
for d in sorted(glob.glob(f'{outdir}/q*')):
    name = os.path.basename(d)
    if name not in oracles:
        n = len(pd.read_parquet(d))
        tag = 'OK' if n > 0 else 'EMPTY!'
        print(f'rows-only {name}: {n} {tag}')
        if n == 0:
            fails.append(name)
print('oracles:', len(oracles), 'fails:', fails or 'NONE')
