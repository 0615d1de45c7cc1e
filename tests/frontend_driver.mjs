// Drive the ACTUAL frontend JavaScript served by the webapp — not a
// re-implementation of it. The harness fetches `/`, extracts the page's
// inline <script>, and executes it verbatim in a node `vm` context under
// a minimal DOM + cookie-jar fetch shim; it then fires the same event
// handlers a browser would (file input change, form submit, Enter key,
// button/list clicks) and asserts on what the page's own code rendered
// into #chat. Run by tests/test_app_layer.py (skipped when node is
// absent); reference counterpart: static/js/app.js:55-133 (upload/ask
// wiring) and app.py:109-111 (serving index.html).
//
// Usage: node frontend_driver.mjs <base_url> <csv_path>
// Prints one JSON line: {"pass": bool, "checks": {...}, "error": ...}
import { readFileSync } from "node:fs";
import { basename } from "node:path";
import vm from "node:vm";

const [base, csvPath] = process.argv.slice(2);
const checks = {};

// ---- minimal DOM ---------------------------------------------------
class Element {
  constructor(tag) {
    this.tagName = tag;
    this.children = [];
    this.className = "";
    this._text = "";
    this._html = "";
    this.value = "";
    this.scrollTop = 0;
    this.scrollHeight = 0;
    this.files = [];
    this.classList = {
      _s: new Set(),
      add(c) { this._s.add(c); },
      remove(c) { this._s.delete(c); },
    };
  }
  appendChild(el) { this.children.push(el); return el; }
  get textContent() { return this._text; }
  set textContent(v) { this._text = String(v); this.children = []; }
  get innerHTML() { return this._html; }
  set innerHTML(v) { this._html = String(v); if (v === "") this.children = []; }
  click() { if (this.onclick) return this.onclick(); }
}
const byId = {};
for (const id of [
  "dragArea", "fileInput", "fileList", "sessionList",
  "newSessionBtn", "chat", "askForm", "questionInput",
]) byId[id] = new Element(id === "fileList" || id === "sessionList" ? "ul" : "div");

const document = {
  getElementById: (id) => byId[id],
  createElement: (tag) => new Element(tag),
};

// ---- cookie-jar fetch, serialized so the session cookie is coherent -
const jar = new Map();
let chain = Promise.resolve();
function cookieFetch(path, opts = {}) {
  const run = async () => {
    const headers = new Headers(opts.headers || {});
    if (jar.size) {
      headers.set("cookie", [...jar.entries()].map(([k, v]) => `${k}=${v}`).join("; "));
    }
    const res = await fetch(new URL(path, base), { ...opts, headers });
    for (const sc of res.headers.getSetCookie?.() ?? []) {
      const [kv] = sc.split(";");
      const eq = kv.indexOf("=");
      jar.set(kv.slice(0, eq).trim(), kv.slice(eq + 1).trim());
    }
    return res;
  };
  chain = chain.then(run, run);
  return chain;
}

// ---- execute the page's real script --------------------------------
const html = await (await cookieFetch("/")).text();
const m = html.match(/<script>([\s\S]*?)<\/script>/);
if (!m) { console.log(JSON.stringify({ pass: false, error: "no inline script" })); process.exit(1); }

const ctx = vm.createContext({
  document, fetch: cookieFetch, FormData, Headers, URL, JSON, Promise,
  console, setTimeout, String, Error,
});
vm.runInContext(m[1], ctx, { filename: "index.html#script" });

const sleep = (ms) => new Promise((r) => setTimeout(r, ms));
async function settle(pred, ms = 30000) {
  const t0 = Date.now();
  while (Date.now() - t0 < ms) { if (pred()) return true; await sleep(50); }
  return false;
}
const chat = byId.chat;
const bots = () => chat.children.filter((c) => c.className === "msg bot");

try {
  // 1. the page's boot calls (refreshFiles/refreshSessions/loadHistory)
  //    must settle without errors and render the session list
  checks.boot_sessions = await settle(() => byId.sessionList.children.length >= 1);

  // 2. upload through the page's own file-input wiring
  const bytes = readFileSync(csvPath);
  const file = new File([bytes], basename(csvPath), { type: "text/csv" });
  byId.fileInput.files = [file];
  await byId.fileInput.onchange({ target: byId.fileInput });
  const up = bots().at(-1);
  checks.upload_rendered = Boolean(up) && up.innerHTML.includes("<b>" + basename(csvPath) + "</b>");
  checks.upload_row_count = Boolean(up) && /（200 行）/.test(up.innerHTML);
  checks.file_listed = await settle(() => byId.fileList.children.length === 1);

  // 3. ask through the form-submit handler; the page's md() renderer
  //    must turn the markdown pipe table into <table> cells
  byId.questionInput.value = "sum of o_totalprice by o_orderstatus";
  byId.askForm.onsubmit({ preventDefault() {} });
  checks.ask_table = await settle(() => {
    const b = bots().at(-1);
    return b && b.innerHTML.includes("<table>") && b.innerHTML.includes("数据分析结果");
  });

  // 4. Enter-key path (the second ask wiring)
  byId.questionInput.value = "count of rows";
  byId.questionInput.onkeydown({ key: "Enter", shiftKey: false, preventDefault() {} });
  checks.enter_key_ask = await settle(() => bots().length >= 3 && bots().at(-1)._html.includes("<table>"));

  // 5. history reload: switching back to the same session replays it
  await byId.newSessionBtn.onclick();
  checks.new_session_clears = chat.children.length === 0;
  await settle(() => byId.sessionList.children.length >= 2);
  // find the original session among the listed ones and click it
  // through the page's own <li> handler; its two Q&A pairs (the upload
  // notice is ephemeral, not history) must replay as rendered tables
  let replayed = false;
  for (const li of [...byId.sessionList.children]) {
    await li.onclick();
    const ok = await settle(
      () => bots().length >= 2 && bots().at(-1)._html.includes("<table>"), 8000);
    if (ok) { replayed = true; break; }
  }
  checks.switch_replays_history = replayed;

  const pass = Object.values(checks).every(Boolean);
  console.log(JSON.stringify({ pass, checks }));
  process.exit(pass ? 0 : 1);
} catch (err) {
  console.log(JSON.stringify({ pass: false, checks, error: String(err && err.stack || err) }));
  process.exit(1);
}
