/**
 * node:test suite for the runmat-tpu TS bindings, run against the real
 * subprocess server: `node --test bindings/ts/test/`
 * (≙ the reference npm package's vitest suite over the wasm session).
 * Covers the four host surfaces: typed builtin registry, fusion-plan
 * introspection, workspace hover, and error mapping.
 */

import test from "node:test";
import assert from "node:assert/strict";
import { RunMatSession, RunMatError } from "../dist/index.js";

const env = { RUNMAT_TPU_PLATFORM: "cpu" };

test("execute + workspace + getValue round trip", async () => {
  const s = new RunMatSession({ env });
  try {
    const r = await s.execute("z = 6 * 7; disp(z)");
    assert.equal(r.ok, true);
    assert.match(r.output ?? "", /42/);
    const ws = await s.workspace();
    assert.equal(ws.z.class, "double");
    const v = await s.getValue("z");
    assert.deepEqual(v.value, [[42]]);
  } finally {
    await s.close();
  }
});

test("typed builtin registry carries spec metadata", async () => {
  const s = new RunMatSession({ env });
  try {
    const items = await s.builtins("sin");
    const sin = items.find((b) => b.name === "sin");
    assert.ok(sin);
    assert.equal(typeof sin.summary, "string");
    assert.equal(typeof sin.min_in, "number");
    assert.equal(typeof sin.accel, "boolean");
    assert.equal(sin.extension, false);
  } finally {
    await s.close();
  }
});

test("fusion plans appear after device work", async () => {
  const s = new RunMatSession({ env });
  try {
    await s.run("x = gpuArray(rand(4096, 1)); y = gather(sum(sin(x) + 1));");
    const plans = await s.fusionPlans();
    assert.ok(plans.length >= 1);
    assert.ok(plans.some((p) => p.ops.length >= 1));
  } finally {
    await s.close();
  }
});

test("workspace hover has residency + preview", async () => {
  const s = new RunMatSession({ env });
  try {
    await s.run("g = gpuArray(ones(64, 1)); h = gather(sum(g));");
    const card = await s.hover("g");
    assert.equal(card.name, "g");
    assert.equal(card.on_device, true);
  } finally {
    await s.close();
  }
});

test("error mapping produces typed RunMatError", async () => {
  const s = new RunMatSession({ env });
  try {
    await assert.rejects(
      () => s.run("thisFunctionDoesNotExist_xyz(1)"),
      (e) => e instanceof RunMatError && e.kind === "undefined"
    );
    await assert.rejects(
      () => s.getValue("noSuchVariable"),
      (e) => e instanceof RunMatError
    );
  } finally {
    await s.close();
  }
});

test("check returns analysis findings", async () => {
  const s = new RunMatSession({ env });
  try {
    const findings = await s.check("y = undefined_thing_xyz + 1;");
    assert.ok(findings.some((f) => /undefined_thing_xyz/.test(f.message)));
  } finally {
    await s.close();
  }
});

test("executeAbi returns the typed event protocol", async () => {
  const s = new RunMatSession({ env });
  try {
    const o = await s.executeAbi(
      "x = [1 2; 3 4]\nwarning('TS:demo:id', 'note'); clear ans;");
    assert.equal(o.ok, true);
    assert.ok(o.streams.length >= 2);
    assert.ok(o.streams.some((e) => e.kind === "stderr"));
    assert.equal(o.display_events[0].label, "x");
    assert.deepEqual(o.display_events[0].size, [2, 2]);
    const names = o.workspace_delta.upserts.map((u) => u.name);
    assert.ok(names.includes("x"));
    assert.deepEqual(o.warnings, [{ identifier: "TS:demo:id", message: "note" }]);
    assert.equal(typeof o.wall_ms, "number");
  } finally {
    await s.close();
  }
});
