"""Shared helpers for the examples."""


def banner(title):
    print("=" * 64)
    print(title)
    print("=" * 64)


def report(res):
    if isinstance(res, dict):
        print(f"  status={res['status']}  iterations={res['iterations']}  "
              f"optval={res['optval']:.6f}  time={res.get('solve_time', 0)*1e3:.1f} ms")
    else:
        print(f"  status={res.status.name}  iterations={int(res.final_iter)}  "
              f"optval={float(res.optval):.6f}")
