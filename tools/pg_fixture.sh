#!/bin/bash
# Idempotent out-of-process PostgreSQL fixture for the JDBC connector
# gate (io/PgFixture.scala execs this). A REAL separate-process database
# — unlike embedded Derby, executor JVMs (local, spark://, or a worker
# inside another network namespace) reach it over TCP, so the JDBC
# source/sink path is exercised across genuine process AND host
# boundaries.
#
# Postgres refuses to run as root, so the fixture runs under a dedicated
# throwaway OS user. Everything is test-fixture-grade by design: trust
# auth, but bound ONLY to loopback and the netns veth address
# (10.200.0.1), with pg_hba restricted to 127.0.0.1/32 and
# 10.200.0.0/24 — the fixture is never reachable from outside the
# machine even when verify/bench auto-launch it. Data dir under /tmp.
set -euo pipefail

PGBIN=${PGBIN:-/usr/lib/postgresql/15/bin}
# /tmp, not target/: the fixture user cannot traverse /root/<repo>
PGDATA=${SPARK_GRAFT_PGDATA:-/tmp/graft_pgfx/data}
PGPORT=${SPARK_GRAFT_PGPORT:-54329}
FXUSER=pgfx

[ -x "$PGBIN/initdb" ] || { echo "pg_fixture: no postgres at $PGBIN" >&2; exit 3; }

cd /
if [ "$(id -u)" = 0 ]; then
  id -u $FXUSER >/dev/null 2>&1 || useradd -M -s /bin/bash $FXUSER
  run_as() { su -s /bin/bash $FXUSER -c "cd / && $1"; }
else
  run_as() { bash -c "$1"; }
fi

mkdir -p "$(dirname "$PGDATA")"
if [ ! -f "$PGDATA/PG_VERSION" ]; then
  mkdir -p "$PGDATA"
  chmod 700 "$PGDATA"
  [ "$(id -u)" = 0 ] && chown -R $FXUSER "$(dirname "$PGDATA")"
  run_as "'$PGBIN/initdb' -D '$PGDATA' -U graft --auth=trust" >/dev/null
fi

# Restrict trust auth to loopback + the netns veth subnet only (also
# repairs data dirs initialised by the pre-r14 all-interfaces fixture).
if ! grep -q "10.200.0.0/24" "$PGDATA/pg_hba.conf"; then
  sed -i '/0\.0\.0\.0\/0\|::0\/0/d' "$PGDATA/pg_hba.conf"
  echo "host all all 127.0.0.1/32 trust" >> "$PGDATA/pg_hba.conf"
  echo "host all all 10.200.0.0/24 trust" >> "$PGDATA/pg_hba.conf"
  # a server already running was started with the old all-interfaces
  # listen config — stop it so the restart below applies the new one
  run_as "'$PGBIN/pg_ctl' -D '$PGDATA' status" >/dev/null 2>&1 && \
    run_as "'$PGBIN/pg_ctl' -D '$PGDATA' -m fast -w stop" >/dev/null 2>&1 || true
fi

# a server started while the veth was DOWN bound only loopback (the
# 10.200.0.1 bind failed as a warning); if the veth address exists now
# but the server is not reachable on it, restart so the bind list is
# re-evaluated — found by the round-14 netns full-gate run (a local
# serve-chain run had started the fixture before the cluster came up,
# and executors' TCP connects to 10.200.0.1:$PGPORT were refused)
if ip -o addr show 2>/dev/null | grep -q "10\.200\.0\.1/" && \
   run_as "'$PGBIN/pg_ctl' -D '$PGDATA' status" >/dev/null 2>&1 && \
   ! run_as "'$PGBIN/psql' -h 10.200.0.1 -p $PGPORT -U graft -d postgres \
       -Atc 'SELECT 1'" >/dev/null 2>&1; then
  run_as "'$PGBIN/pg_ctl' -D '$PGDATA' -m fast -w stop" >/dev/null 2>&1 || true
fi

if ! run_as "'$PGBIN/pg_ctl' -D '$PGDATA' status" >/dev/null 2>&1; then
  # listen only on loopback + the veth host address; a missing
  # 10.200.0.1 (cluster down) is a Postgres WARNING, not fatal
  run_as "'$PGBIN/pg_ctl' -D '$PGDATA' -l '$PGDATA/server.log' \
    -o '-p $PGPORT -k /tmp -c listen_addresses=localhost,10.200.0.1' -w start" >/dev/null
fi

if ! run_as "'$PGBIN/psql' -h /tmp -p $PGPORT -U graft -d postgres -Atc \
    \"SELECT 1 FROM pg_database WHERE datname='graft'\"" | grep -q 1; then
  run_as "'$PGBIN/createdb' -h /tmp -p $PGPORT -U graft graft"
fi
echo "pg_fixture: ready on port $PGPORT"
